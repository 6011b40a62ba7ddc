"""True multi-controller SPMD: two OS processes joined through
jax.distributed.initialize (the TPU-pod launch path, parallel/launch.py)
each drive 4 virtual CPU devices; the global 8-device mesh must see all
devices, stripe input by (rank, world), and agree on a globally-reduced
loss — the reference's torchrun/NCCL rendezvous role (run.sh:66-68)."""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.environ["REPO_ROOT"])
from wespeaker_hubert_tpu.parallel.launch import initialize_distributed
from wespeaker_hubert_tpu.data.dataset import shard_list_for_rank

port = os.environ["COORD_PORT"]
pid = int(os.environ["PROC_ID"])
rank, world = initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert (rank, world) == (pid, 2), (rank, world)
assert jax.process_count() == 2
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

# rank-striped input selection (reference DistributedSampler role)
entries = [f"utt{i}" for i in range(16)]
mine = shard_list_for_rank(entries, epoch=0, rank=rank, world_size=world)
assert len(mine) == 8

# global mesh + data-sharded global array, globally-reduced mean:
# every process must compute the identical global value
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
local = (np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100 * rank)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (8, 3)
)

@jax.jit
def global_mean(x):
    return jnp.mean(x * x)

val = float(global_mean(garr))
print(json.dumps({"rank": rank, "mine": mine[:3], "val": val}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env_base = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            COORD_PORT=str(port),
            PROC_ID=str(pid),
            REPO_ROOT=os.path.join(os.path.dirname(__file__), ".."),
            JAX_PLATFORMS="cpu",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=220)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert {o["rank"] for o in outs} == {0, 1}
    # both controllers computed the SAME globally-reduced value
    assert outs[0]["val"] == outs[1]["val"]
    # and their input stripes are disjoint rank slices of the dataset
    assert set(outs[0]["mine"]).isdisjoint(outs[1]["mine"])


_TRAIN_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.environ["REPO_ROOT"])
from wespeaker_hubert_tpu.parallel import make_mesh, shard_batch
from wespeaker_hubert_tpu.parallel.launch import initialize_distributed
from wespeaker_hubert_tpu.models import get_projection, get_speaker_model
from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
from wespeaker_hubert_tpu.train import (
    ExponentialDecrease, MarginSchedule, create_train_state,
    make_optimizer, make_train_step, shard_train_state,
)

pid = int(os.environ["PROC_ID"])
rank, world = initialize_distributed(
    coordinator_address=f"localhost:{os.environ['COORD_PORT']}",
    num_processes=2, process_id=pid,
)

net = SpeakerNet(
    backbone=get_speaker_model("ECAPA_TDNN_c512")(feat_dim=16, embed_dim=16),
    projection=get_projection({"project_type": "arc_margin",
                               "embed_dim": 16, "num_class": 8,
                               "scale": 32.0}),
)
lr = ExponentialDecrease(num_epochs=2, epoch_iter=2, initial_lr=0.1,
                         final_lr=0.01, warm_up_epoch=1, scale_ratio=1.0)
margin = MarginSchedule(epoch_iter=2, increase_start_epoch=1,
                        fix_start_epoch=2, initial_margin=0.0,
                        final_margin=0.2)
tx = make_optimizer(lr, weight_decay=0.0)

# every host: ITS 8 rows of the 16-row global batch (rank striping)
rng = np.random.default_rng(100 + rank)
local = {
    "feat": rng.standard_normal((8, 20, 16)).astype(np.float32),
    "label": rng.integers(0, 8, 8).astype(np.int32),
}
mesh = make_mesh(model_parallel=2)  # global (data=4, model=2)
state = shard_train_state(
    create_train_state(net, tx, jax.random.key(0),
                       jnp.zeros((16, 20, 16)), jnp.zeros((16,), jnp.int32)),
    mesh,
)
step = make_train_step(net, tx, lr, margin, mesh=mesh)
gbatch = shard_batch(local, mesh)
assert gbatch["feat"].shape == (16, 20, 16), gbatch["feat"].shape
state, metrics = step(state, gbatch, jax.random.key(5))
print(json.dumps({"rank": rank, "loss": float(metrics["loss"])}),
      flush=True)
"""


def test_two_process_train_step(tmp_path):
    """One sharded train step across two controllers: the global batch
    is assembled from per-host rows (shard_batch multi-controller path),
    both controllers report the identical loss, and that loss equals a
    single-process run on the concatenated 16-row batch."""
    port = _free_port()
    script = tmp_path / "train_worker.py"
    script.write_text(_TRAIN_WORKER)
    env_base = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            COORD_PORT=str(port),
            PROC_ID=str(pid),
            REPO_ROOT=os.path.join(os.path.dirname(__file__), ".."),
            JAX_PLATFORMS="cpu",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=220)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert outs[0]["loss"] == outs[1]["loss"]

    # reference: the same step on ONE controller with the same global
    # batch (both hosts' rows concatenated in rank order)
    import numpy as np

    import jax
    import jax.numpy as jnp

    from wespeaker_hubert_tpu.models import (
        get_projection,
        get_speaker_model,
    )
    from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
    from wespeaker_hubert_tpu.train import (
        ExponentialDecrease,
        MarginSchedule,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    net = SpeakerNet(
        backbone=get_speaker_model("ECAPA_TDNN_c512")(
            feat_dim=16, embed_dim=16
        ),
        projection=get_projection({
            "project_type": "arc_margin", "embed_dim": 16,
            "num_class": 8, "scale": 32.0,
        }),
    )
    lr = ExponentialDecrease(num_epochs=2, epoch_iter=2, initial_lr=0.1,
                             final_lr=0.01, warm_up_epoch=1,
                             scale_ratio=1.0)
    margin = MarginSchedule(epoch_iter=2, increase_start_epoch=1,
                            fix_start_epoch=2, initial_margin=0.0,
                            final_margin=0.2)
    tx = make_optimizer(lr, weight_decay=0.0)
    feats, labels = [], []
    for rank in range(2):
        rng = np.random.default_rng(100 + rank)
        feats.append(rng.standard_normal((8, 20, 16)).astype(np.float32))
        labels.append(rng.integers(0, 8, 8).astype(np.int32))
    batch = {
        "feat": jnp.asarray(np.concatenate(feats)),
        "label": jnp.asarray(np.concatenate(labels)),
    }
    state = create_train_state(
        net, tx, jax.random.key(0), jnp.zeros((16, 20, 16)),
        jnp.zeros((16,), jnp.int32),
    )
    _, metrics = make_train_step(net, tx, lr, margin)(
        state, batch, jax.random.key(5)
    )
    assert outs[0]["loss"] == pytest.approx(
        float(metrics["loss"]), rel=1e-4
    )


_PACKED_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.environ["REPO_ROOT"])
from wespeaker_hubert_tpu.ops.fbank import FbankConfig
from wespeaker_hubert_tpu.ops.pipeline import FeaturePipelineConfig
from wespeaker_hubert_tpu.parallel import make_mesh, shard_batch
from wespeaker_hubert_tpu.parallel.launch import initialize_distributed
from wespeaker_hubert_tpu.models import get_projection, get_speaker_model
from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
from wespeaker_hubert_tpu.train import (
    ExponentialDecrease, MarginSchedule, create_train_state,
    make_optimizer, make_train_step, shard_train_state,
)

pid = int(os.environ["PROC_ID"])
rank, world = initialize_distributed(
    coordinator_address=f"localhost:{os.environ['COORD_PORT']}",
    num_processes=2, process_id=pid,
)

net = SpeakerNet(
    backbone=get_speaker_model("ECAPA_TDNN_c512")(feat_dim=24, embed_dim=16),
    projection=get_projection({"project_type": "arc_margin",
                               "embed_dim": 16, "num_class": 8,
                               "scale": 32.0}),
)
lr = ExponentialDecrease(num_epochs=2, epoch_iter=2, initial_lr=0.1,
                         final_lr=0.01, warm_up_epoch=1, scale_ratio=1.0)
margin = MarginSchedule(epoch_iter=2, increase_start_epoch=1,
                        fix_start_epoch=2, initial_margin=0.0,
                        final_margin=0.2)
tx = make_optimizer(lr, weight_decay=0.0)
fcfg = FeaturePipelineConfig(
    fbank=FbankConfig(num_mel_bins=24, dither=0.0), spec_aug=False
)

# per-host PACKED aug block: [2 reverb | 2 noise | 4 clean] of 8 rows
rng = np.random.default_rng(100 + rank)
local = {
    "wav": rng.standard_normal((8, 3200)).astype(np.float32) * 0.1,
    "label": rng.integers(0, 8, 8).astype(np.int32),
    "rir": rng.standard_normal((2, 64)).astype(np.float32),
    "noise": rng.standard_normal((2, 3200)).astype(np.float32) * 0.05,
    "snr": rng.uniform(5, 15, 2).astype(np.float32),
}
mesh = make_mesh(model_parallel=2)  # global (data=4, model=2)
state = shard_train_state(
    create_train_state(net, tx, jax.random.key(0),
                       jnp.zeros((16, 20, 24)), jnp.zeros((16,), jnp.int32)),
    mesh,
)
step = make_train_step(net, tx, lr, margin, feature_cfg=fcfg, mesh=mesh,
                       aug_blocks=2)
gbatch = shard_batch(local, mesh)
assert gbatch["wav"].shape == (16, 3200), gbatch["wav"].shape
assert gbatch["rir"].shape == (4, 64), gbatch["rir"].shape
state, metrics = step(state, gbatch, jax.random.key(5))
print(json.dumps({"rank": rank, "loss": float(metrics["loss"])}),
      flush=True)
"""


def test_two_process_packed_aug_train_step(tmp_path):
    """Multi-controller PACKED aug: each host ships one deterministic
    [reverb|noise|clean] block; shard_batch concatenates the compact
    rir/noise/snr arrays per host and the step vmaps the packed kernel
    over the block axis (aug_blocks=2).  Both controllers' loss must
    equal a single-process step on wav that was pre-augmented block by
    block with the single-block kernel — an independent reference path
    that never sees aug_blocks."""
    port = _free_port()
    script = tmp_path / "packed_worker.py"
    script.write_text(_PACKED_WORKER)
    env_base = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            COORD_PORT=str(port),
            PROC_ID=str(pid),
            REPO_ROOT=os.path.join(os.path.dirname(__file__), ".."),
            JAX_PLATFORMS="cpu",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=220)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert outs[0]["loss"] == outs[1]["loss"]

    import numpy as np

    import jax
    import jax.numpy as jnp

    from wespeaker_hubert_tpu.models import (
        get_projection,
        get_speaker_model,
    )
    from wespeaker_hubert_tpu.models.speaker_net import SpeakerNet
    from wespeaker_hubert_tpu.ops.augment import add_reverb_noise_packed
    from wespeaker_hubert_tpu.ops.fbank import FbankConfig
    from wespeaker_hubert_tpu.ops.pipeline import FeaturePipelineConfig
    from wespeaker_hubert_tpu.train import (
        ExponentialDecrease,
        MarginSchedule,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    net = SpeakerNet(
        backbone=get_speaker_model("ECAPA_TDNN_c512")(
            feat_dim=24, embed_dim=16
        ),
        projection=get_projection({
            "project_type": "arc_margin", "embed_dim": 16,
            "num_class": 8, "scale": 32.0,
        }),
    )
    lr = ExponentialDecrease(num_epochs=2, epoch_iter=2, initial_lr=0.1,
                             final_lr=0.01, warm_up_epoch=1,
                             scale_ratio=1.0)
    margin = MarginSchedule(epoch_iter=2, increase_start_epoch=1,
                            fix_start_epoch=2, initial_margin=0.0,
                            final_margin=0.2)
    tx = make_optimizer(lr, weight_decay=0.0)
    fcfg = FeaturePipelineConfig(
        fbank=FbankConfig(num_mel_bins=24, dither=0.0), spec_aug=False
    )
    wavs, labels = [], []
    for rank in range(2):
        rng = np.random.default_rng(100 + rank)
        wav = rng.standard_normal((8, 3200)).astype(np.float32) * 0.1
        label = rng.integers(0, 8, 8).astype(np.int32)
        rir = rng.standard_normal((2, 64)).astype(np.float32)
        noise = rng.standard_normal((2, 3200)).astype(np.float32) * 0.05
        snr = rng.uniform(5, 15, 2).astype(np.float32)
        wavs.append(np.asarray(add_reverb_noise_packed(
            jnp.asarray(wav), jnp.asarray(rir), jnp.asarray(noise),
            jnp.asarray(snr), 2,
        )))
        labels.append(label)
    batch = {
        "wav": jnp.asarray(np.concatenate(wavs)),
        "label": jnp.asarray(np.concatenate(labels)),
    }
    state = create_train_state(
        net, tx, jax.random.key(0), jnp.zeros((16, 20, 24)),
        jnp.zeros((16,), jnp.int32),
    )
    _, metrics = make_train_step(net, tx, lr, margin, feature_cfg=fcfg)(
        state, batch, jax.random.key(5)
    )
    assert outs[0]["loss"] == pytest.approx(
        float(metrics["loss"]), rel=1e-4
    )


_FSDP_SAVE_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.environ["REPO_ROOT"])
from wespeaker_hubert_tpu.parallel.launch import initialize_distributed
from wespeaker_hubert_tpu.utils.checkpoint import (
    load_checkpoint, save_checkpoint,
)

pid = int(os.environ["PROC_ID"])
rank, world = initialize_distributed(
    coordinator_address=f"localhost:{os.environ['COORD_PORT']}",
    num_processes=2, process_id=pid,
)
mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
# an fsdp-style param: sharded over 'data', which SPANS both processes
# (not fully addressable from either) — np.asarray on it would raise
local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100 * rank
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (8, 3)
)
assert not garr.is_fully_addressable
path = os.path.join(os.environ["CKPT_DIR"], f"fsdp_{rank}.ckpt")
save_checkpoint(path, {"w": garr}, meta={"rank": rank})
back = load_checkpoint(path)
print(json.dumps({"rank": rank, "sum": float(np.sum(back["w"])),
                  "shape": list(np.shape(back["w"]))}), flush=True)
"""


def test_two_process_fsdp_checkpoint_save(tmp_path):
    """Saving an fsdp-sharded (host-spanning) param must gather the
    GLOBAL value on every process instead of crashing on a
    non-addressable jax.Array (the multi-host ZeRO-3 save path)."""
    port = _free_port()
    script = tmp_path / "fsdp_worker.py"
    script.write_text(_FSDP_SAVE_WORKER)
    env_base = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            COORD_PORT=str(port),
            PROC_ID=str(pid),
            CKPT_DIR=str(tmp_path),
            REPO_ROOT=os.path.join(os.path.dirname(__file__), ".."),
            JAX_PLATFORMS="cpu",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=220)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    # both processes persisted the FULL (8, 3) global array:
    # sum = sum(0..11) + sum(0..11) + 12*100 (rank-1 block offset)
    expect = 66.0 * 2 + 12 * 100
    for o in outs:
        assert o["shape"] == [8, 3]
        assert o["sum"] == expect


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
