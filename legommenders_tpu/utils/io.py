"""Small IO helpers (json/jsonl/yaml/pickle/npy).

Parity: reference utils/io.py (json/yaml/pickle helpers).
"""
import json
import os
import pickle

import numpy as np
import yaml


def json_load(path):
    with open(path, "r") as f:
        return json.load(f)


def json_save(obj, path, indent=2):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=indent, default=_default)


def _default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not json-serializable: {type(o)}")


def jsonl_load(path):
    with open(path, "r") as f:
        return [json.loads(line) for line in f if line.strip()]


def jsonl_append(obj, path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(obj, default=_default) + "\n")


def yaml_load(path):
    with open(path, "r") as f:
        return yaml.safe_load(f)


def yaml_save(obj, path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(obj, f, sort_keys=False)


def pickle_load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def pickle_save(obj, path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def npy_load(path):
    return np.load(path, allow_pickle=False)


def npy_save(arr, path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.save(path, arr)
