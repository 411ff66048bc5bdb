"""Two-process jax.distributed simulation on CPU: validates multi-host mesh
construction, per-process batch sharding via make_array_from_process_local_data,
and that both processes compute the same global metrics (the property the
reference gets from DDP+all_reduce, util/misc.py:40-51)."""
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:{port}",
    num_processes=2, process_id={pid})
import jax.numpy as jnp
import numpy as np
from ep_tpu.configs import TrainConfig
from ep_tpu.models.assembly import ProbeModel
from ep_tpu.models.vit import ViTConfig
from ep_tpu.parallel.mesh import make_mesh, set_current_mesh, shard_batch
from ep_tpu.train.lars import build_optimizer
from ep_tpu.train.schedule import make_lr_fn
from ep_tpu.train.state import create_train_state
from ep_tpu.train.steps import make_train_step

assert jax.process_count() == 2, jax.process_count()
mesh = make_mesh()
set_current_mesh(mesh)
assert mesh.devices.size == jax.device_count()

cfg = TrainConfig(cls_features="gap", nb_classes=4, image_size=16,
                  batch_size=16, eff_batch_size=16, amp="float32",
                  epochs=2, warmup_epochs=1, blr=1.0)
bcfg = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=1,
                 num_heads=2, dtype=jnp.float32)
model = ProbeModel(bcfg, cfg)
variables = model.init(jax.random.key(0), jnp.zeros((2, 16, 16, 3)), train=True)
tx = build_optimizer("lars", 0.0)
state = create_train_state(variables, tx, False)
step = make_train_step(model, tx, make_lr_fn(cfg, 10), mesh)

# every process contributes a DIFFERENT local half of the global batch
rng = np.random.default_rng({pid})
images = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
labels = (np.arange(8) % 4).astype(np.int32)
di, dl = shard_batch((images, labels), mesh)
assert di.shape == (16, 16, 16, 3), di.shape  # global batch

state, metrics = step(state, di, dl)
loss = float(jax.device_get(metrics["loss"]))
print(f"WORKER{{{pid}}} loss {{loss:.6f}}", flush=True)

# phase 2: Pallas kernels (interpret mode) running per-data-shard under
# shard_map on the CROSS-PROCESS mesh — validates the
# parallel/mesh.data_parallel_call bridge and the EP-pool custom VJP
# through a multi-host GSPMD train step
os.environ["EP_TPU_PALLAS_INTERPRET"] = "1"
cfg2 = TrainConfig(cls_features="ep", ep_queries=4, d_out=1, nb_classes=4,
                   image_size=16, batch_size=16, eff_batch_size=16,
                   amp="float32", epochs=2, warmup_epochs=1, blr=1.0,
                   pallas_pool=True, attn_impl="pallas")
bcfg2 = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=1,
                  num_heads=2, dtype=jnp.float32, attn_impl="pallas")
model2 = ProbeModel(bcfg2, cfg2)
variables2 = model2.init(jax.random.key(0), jnp.zeros((2, 16, 16, 3)),
                         train=True)
state2 = create_train_state(variables2, tx, False)
step2 = make_train_step(model2, tx, make_lr_fn(cfg2, 10), mesh)
state2, metrics2 = step2(state2, di, dl)
loss2 = float(jax.device_get(metrics2["loss"]))
print(f"WORKERP{{{pid}}} loss {{loss2:.6f}}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        script = tmp_path / f"worker{pid}.py"
        script.write_text(WORKER.format(repo=str(REPO), port=port, pid=pid))
        env = {
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "HOME": "/root",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_PLATFORMS": "cpu",
        }
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker{pid}:\n{out[-3000:]}"
    losses, plosses = [], []
    for out in outs:
        lines = out.splitlines()
        losses.append(float(
            [l for l in lines if l.startswith("WORKER") and
             not l.startswith("WORKERP")][0].split()[-1]))
        plosses.append(float(
            [l for l in lines if l.startswith("WORKERP")][0].split()[-1]))
    # identical global loss on both processes — metrics are globally reduced
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    # same property through the shard_map'd Pallas-kernel (interpret) path
    assert abs(plosses[0] - plosses[1]) < 1e-6, plosses


def test_init_distributed_trigger_logic(monkeypatch):
    """Rank-0 env values must still trigger init; EP_TPU_MULTIHOST=0 opts out;
    single-task SLURM allocations (world size 1) must NOT trigger."""
    import jax
    from ep_tpu.parallel import mesh as M

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1) or (_ for _ in ()).throw(
                            RuntimeError("test: no coordinator")))
    launcher_vars = ["EP_TPU_MULTIHOST", "COORDINATOR_ADDRESS", "SLURM_PROCID",
                     "OMPI_COMM_WORLD_RANK", "JOBSET_NAME", "SLURM_NTASKS",
                     "OMPI_COMM_WORLD_SIZE", "WORLD_SIZE"]

    def run(env):
        for v in launcher_vars:
            monkeypatch.delenv(v, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        calls.clear()
        M.init_distributed()
        return bool(calls)

    # rank 0 of a 4-task SLURM job MUST init (the round-1 bug: "0" read as off)
    assert run({"SLURM_PROCID": "0", "SLURM_NTASKS": "4"})
    assert run({"OMPI_COMM_WORLD_RANK": "0", "OMPI_COMM_WORLD_SIZE": "2"})
    # nonzero ranks too
    assert run({"SLURM_PROCID": "3", "SLURM_NTASKS": "4"})
    # forced on/off
    assert run({"EP_TPU_MULTIHOST": "1"})
    assert not run({"EP_TPU_MULTIHOST": "0", "SLURM_PROCID": "1",
                    "SLURM_NTASKS": "4"})
    # single-task allocation: launcher var present but world size 1
    assert not run({"SLURM_PROCID": "0", "SLURM_NTASKS": "1"})
    # bare shell, no launcher
    assert not run({})


CACHE_WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:{port}",
    num_processes=2, process_id={pid})
import jax.numpy as jnp
import ep_tpu.models.assembly as asm
import ep_tpu.cli.linprobe as lp
from ep_tpu.configs import TrainConfig
from ep_tpu.models.vit import ViTConfig

TINY = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=2,
                 num_heads=2, dtype=jnp.float32)
asm.build_backbone_config = lambda cfg: TINY
lp.build_backbone_config = lambda cfg: TINY

cfg = TrainConfig(dataset_name="fake", nb_classes=4, image_size=16,
                  batch_size=16, model="vit_tiny_patch16", cls_features="gap",
                  cache_features=True, epochs=5, warmup_epochs=1, blr=4.0,
                  amp="float32", num_workers=1, seed=0,
                  output_dir={outdir!r})
res = lp.main(cfg)
# force=True: setup_for_distributed silences plain prints on rank != 0
print(f"CACHEWORKER{{{pid}}} max_acc {{res['max_accuracy']:.4f}}",
      force=True, flush=True)
"""


@pytest.mark.slow
def test_two_process_cache_features(tmp_path):
    """--cache_features across 2 processes: per-host sharded extraction +
    allgather; both hosts train on the full cache and agree on accuracy."""
    port = _free_port()
    procs = []
    for pid in range(2):
        script = tmp_path / f"cworker{pid}.py"
        script.write_text(CACHE_WORKER.format(
            repo=str(REPO), port=port, pid=pid,
            outdir=str(tmp_path / "out")))
        env = {
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "HOME": "/root",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_PLATFORMS": "cpu",
        }
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"cworker{pid}:\n{out[-3000:]}"
    accs = []
    for out in outs:
        line = [l for l in out.splitlines() if "CACHEWORKER" in l][0]
        accs.append(float(line.split()[-1]))
    assert abs(accs[0] - accs[1]) < 1e-6, accs  # identical global training
    assert accs[0] > 40.0  # chance = 25%
