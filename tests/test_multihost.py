"""Two-process jax.distributed test for parallel/multihost.py.

Proves the DCN-axis path actually runs (VERDICT r1 next-step #10): two
CPU processes (2 local devices each) join via a local coordinator, build
the global 4-device mesh with ``global_mesh``, and data-parallel-train a
PointNet classifier step — XLA inserts the gradient psum ACROSS the
process boundary (gloo collectives). Both processes must compute the
identical reduced gradient. The reference has no analogue (its only
parallelism is one in-process nn.DataParallel, train_flownet.py:243-245).
"""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    pid, port = int(sys.argv[1]), sys.argv[2]
    sys.path.insert(0, {repo!r})

    from learning3d_tpu.parallel.multihost import (
        global_mesh, initialize_multihost, is_primary,
    )

    initialize_multihost(
        coordinator_address=f"127.0.0.1:{{port}}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert (pid == 0) == is_primary()

    import numpy as np
    import jax.numpy as jnp
    from flax import nnx
    from learning3d_tpu.models import Classifier, PointNet
    from learning3d_tpu.parallel.mesh import batch_sharding

    mesh = global_mesh(("data",))  # 4 global devices, DP across processes
    model = Classifier(PointNet(emb_dims=32, rngs=nnx.Rngs(0)), num_classes=4, rngs=nnx.Rngs(1))
    model.eval()
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)

    # same GLOBAL batch in every process; jax.make_array_from_process_local_data
    # shards it over the 4 global devices (2 per process)
    pts_h = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (4, 16, 3)))
    lbl_h = np.arange(4) % 4
    sh = batch_sharding(mesh, 3)
    pts = jax.make_array_from_process_local_data(sh, pts_h[2 * pid : 2 * pid + 2])
    lbl = jax.make_array_from_process_local_data(batch_sharding(mesh, 1), lbl_h[2 * pid : 2 * pid + 2])

    def loss_fn(params, pts, lbl):
        m = nnx.merge(graphdef, params, rest)
        logits = m(pts)
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(logp, lbl[:, None], axis=1))

    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    loss, grads = jax.jit(
        jax.value_and_grad(loss_fn), out_shardings=(rep, rep)
    )(params, pts, lbl)
    gsum = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    print(f"RESULT pid={{pid}} loss={{float(loss):.8f}} gsum={{gsum:.8f}}", flush=True)
    """
).format(repo=REPO)


def test_two_process_psum_gradient():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd="/tmp",
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        kv = dict(part.split("=") for part in line.split()[1:])
        results[kv["pid"]] = (float(kv["loss"]), float(kv["gsum"]))
    assert results["0"] == results["1"], results
    assert results["0"][1] > 0.0
