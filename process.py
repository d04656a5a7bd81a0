"""Offline preprocessing CLI (parity: reference process.py:71-138).

    python process.py --data synthetic
    python process.py --data mind --raw_dir /path/to/MINDsmall
"""
import sys

from legommenders_tpu.utils.function import parse_cli
from legommenders_tpu.utils.registry import PROCESSORS
import legommenders_tpu.data.processors  # noqa: F401 (register)


def main(argv):
    cli = parse_cli(argv)
    name = cli.get("data")
    if not name:
        raise SystemExit("--data is required")
    if name.lower() not in PROCESSORS:
        raise SystemExit(
            f"unknown processor {name}; known: {PROCESSORS.keys()}")
    cls = PROCESSORS[name.lower()]
    kwargs = {}
    if cli.get("raw_dir"):
        kwargs["raw_dir"] = cli["raw_dir"]
    if cli.get("save_dir"):
        kwargs["save_dir"] = cli["save_dir"]
    # extra LM tokenizers: --tokenizers bertbase+llama1 or glove:/path
    # (reference attaches BERT/Llama/GloVe tokenizers per text attribute,
    # mind_processor.py:62-88)
    if cli.get("tokenizers") and "extra_tokenizers" in \
            cls.__init__.__code__.co_varnames:
        from legommenders_tpu.data.tokenizers import resolve
        extra = {}
        for spec in str(cli["tokenizers"]).split("+"):
            vocab_name, fn, vocab = resolve(spec)
            extra[vocab_name] = (fn, int(cli.get("lm_truncate", 50)), vocab)
        kwargs["extra_tokenizers"] = extra
    # xMIND: reference re-tokenizes every language with one HF tokenizer
    # (processor/xmind_processor.py:38-60) — expose that via the same
    # --tokenizers spec (single spec, e.g. `llama1` from the .model
    # dotfile, or `word` for the no-checkpoint default)
    if "tokenize_fn" in cls.__init__.__code__.co_varnames:
        if cli.get("tokenizers"):
            from legommenders_tpu.data.tokenizers import resolve
            spec = str(cli["tokenizers"]).split("+")[0]
            _, fn, _vocab = resolve(spec)
            kwargs["tokenize_fn"] = fn
        if cli.get("mind_dir"):
            kwargs["mind_dir"] = cli["mind_dir"]
    processor = cls(**kwargs)
    stores = processor.load(regenerate=bool(cli.get("regenerate")))
    for part, store in stores.items():
        print(f"{part}: {len(store)} rows, cols {store.col_names()}")


if __name__ == "__main__":
    main(sys.argv[1:])
