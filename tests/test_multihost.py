"""Multi-process jax.distributed test: 2 CPU processes x 2 virtual devices
form one 4-device cluster; a dp-sharded global array is reduced across
processes (SURVEY §4: the standard substitute for a real TPU pod)."""
import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from `make test`, run by `make ci`

WORKER = textwrap.dedent("""
    import sys, os
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    from legommenders_tpu.parallel.mesh import initialize_multihost
    idx, count = initialize_multihost("127.0.0.1:{port}", 2, pid)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("dp",))
    sharding = NamedSharding(mesh, P("dp"))
    local = np.full((4,), idx + 1.0, np.float32)
    x = jax.make_array_from_process_local_data(sharding, local, (8,))
    total = jax.jit(lambda v: v.sum(),
                    out_shardings=NamedSharding(mesh, P()))(x)
    assert float(total) == 12.0, float(total)
    print(f"OK {{idx}}/{{count}} sum={{float(total)}}")
""")


def test_two_process_distributed(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo, port=45791))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "OK" in out
