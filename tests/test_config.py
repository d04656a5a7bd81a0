from legommenders_tpu.config.parser import (
    Obj, load_config, load_yaml_with_imports, resolve, parse_four_way,
)
from legommenders_tpu.utils.function import (
    get_signature, infer_type, parse_cli, combine_config,
)


def test_infer_type():
    assert infer_type("3") == 3
    assert infer_type("3.5") == 3.5
    assert infer_type("true") is True
    assert infer_type("null") is None
    assert infer_type("abc") == "abc"


def test_parse_cli():
    out = parse_cli(["--data", "mind", "--lr", "0.01", "--flag"])
    assert out == {"data": "mind", "lr": 0.01, "flag": True}


def test_interpolation_defaults():
    tree = {
        "a": "${hidden_size}$",
        "b": "${missing:64}$",
        "c": "prefix-${name:x}$-suffix",
        "d": {"e": "${a}"},
    }
    out = resolve(tree, {"hidden_size": 32})
    assert out["a"] == 32
    assert out["b"] == 64
    assert out["c"] == "prefix-x-suffix"
    assert out["d"]["e"] == 32


def test_dotted_reference():
    tree = {"data": {"base_dir": "data/mind"},
            "item": {"ut": "${data.base_dir}/items"}}
    out = resolve(tree)
    assert out["item"]["ut"] == "data/mind/items"


def test_imports_merge(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
    (tmp_path / "main.yaml").write_text(
        "$$import:\n  - base.yaml\nnested:\n  y: 3\nb: 2\n")
    out = load_yaml_with_imports(str(tmp_path / "main.yaml"))
    assert out == {"a": 1, "nested": {"x": 1, "y": 3}, "b": 2}


def test_signature_stable():
    s1 = get_signature({"a": 1}, {"b": 2})
    s2 = get_signature({"a": 1}, {"b": 2})
    assert s1 == s2 and len(s1) == 8
    assert s1 != get_signature({"a": 2}, {"b": 2})


def test_obj_access():
    o = Obj({"a": {"b": [1, {"c": 2}]}})
    assert o.a.b[1].c == 2
    assert o.missing is None


def test_combine_config():
    assert combine_config({"a": 1}, a=0, b=2) == {"a": 1, "b": 2}
