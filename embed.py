"""Embedding export CLI (parity: reference embed.py:11-51).

    python embed.py --model glove --model_path /path/to/glove.6B.300d.txt
"""
import sys

from legommenders_tpu.utils.function import parse_cli
from legommenders_tpu.utils.registry import EMBEDDERS
import legommenders_tpu.embedders  # noqa: F401 (register)


def main(argv):
    cli = parse_cli(argv)
    name = cli.get("model")
    if not name:
        raise SystemExit("--model is required")
    key = name.lower().replace("embedder", "")
    if key not in EMBEDDERS:
        raise SystemExit(f"unknown embedder {name}; known: {EMBEDDERS.keys()}")
    embedder = EMBEDDERS[key](model_path=cli.get("model_path"))
    path, cfg_path = embedder.export()
    print(f"embeddings saved to {path}; config at {cfg_path} "
          f"(verify vocab_name before use)")


if __name__ == "__main__":
    main(sys.argv[1:])
