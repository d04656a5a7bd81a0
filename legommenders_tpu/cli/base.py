"""BaseLego — experiment scaffold shared by the CLI drivers.

Parity: reference base_lego.py:68-437 — 4-way config parse, seeding,
PathHub + signature, logging, Manager/model construction, checkpoint
save/load. Device selection is implicit (JAX backend); metric evaluation
lives in runtime/evaluator.py.
"""
import os
import sys
from typing import Dict, Optional

from legommenders_tpu.config.parser import parse_four_way
from legommenders_tpu.runtime.manager import Manager
from legommenders_tpu.utils.function import get_signature, parse_cli, seeding
from legommenders_tpu.utils.logging import get_logger
from legommenders_tpu.utils.path_hub import PathHub


class BaseLego:
    required = ("data", "model")

    def __init__(self, argv=None, extra: Optional[Dict] = None):
        cli = parse_cli(argv if argv is not None else sys.argv[1:])
        cli.update(extra or {})
        for key in self.required:
            if key not in cli:
                raise SystemExit(f"--{key} is required")
        cli.setdefault("exp", "default")
        self.cli = cli
        # multi-host bring-up BEFORE any jax computation: after this,
        # jax.devices() spans the pod and exp.policy.mesh lays its axes
        # across hosts (TPU pods auto-detect with bare --distributed true;
        # manual launches pass coordinator/num_processes/process_id)
        if cli.get("coordinator") or cli.get("distributed"):
            from legommenders_tpu.parallel.mesh import initialize_multihost
            initialize_multihost(
                cli.get("coordinator"),
                int(cli["num_processes"]) if cli.get("num_processes") else None,
                int(cli["process_id"]) if cli.get("process_id") is not None
                else None)
        self.cfg = parse_four_way(cli)

        self.seed = int(cli.get("seed", 2023))
        seeding(self.seed)

        data_cfg = self.cfg.data.raw() if self.cfg.data else {}
        model_cfg = self.cfg.model.raw() if self.cfg.model else {}
        embed_cfg = self.cfg.embed.raw() if self.cfg.embed else {}
        exp_cfg = self.cfg.exp.raw() if self.cfg.exp else {}

        signature = get_signature(data_cfg, model_cfg, embed_cfg, exp_cfg,
                                  {"seed": self.seed})
        self.ph = PathHub(
            data_cfg.get("name", cli.get("data", "data")),
            model_cfg.get("name", cli.get("model", "model")),
            signature)
        self.log = get_logger("lego", self.ph.log_path)
        self.log.info(f"signature: {signature}")

        from legommenders_tpu.utils.io import json_save
        json_save({"data": data_cfg, "model": model_cfg,
                   "embed": embed_cfg, "exp": exp_cfg, "seed": self.seed},
                  self.ph.cfg_path)

        self.manager = Manager(data_cfg, model_cfg, embed_cfg, exp_cfg)

    def run(self):
        raise NotImplementedError
