"""End-to-end training integration: micro config, real train step, SPMD.

These compile small-but-complete XLA programs on CPU — the slowest tests in
the suite (minutes). They are the rebuild's substitute for the reference's
untestable manual-GPU validation (SURVEY.md §4).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfdepth_tpu.data.fake import FakeDataset
from vfdepth_tpu.presets import micro_config as _micro_preset
from vfdepth_tpu.training.model import VFDepthModel
from vfdepth_tpu.training.step import create_train_state, build_train_step


def micro_config(depth_model="fusion", pose_model="fusion", **over):
    return _micro_preset(depth_model=depth_model, pose_model=pose_model, **over)


def _batch(cfg, batch_size=1):
    ds = FakeDataset(num_samples=batch_size, num_cams=cfg.num_cams,
                     height=cfg.height, width=cfg.width,
                     fusion_level=cfg.fusion_level)
    return {k: jnp.asarray(v) for k, v in ds.batch(list(range(batch_size))).items()}


@pytest.mark.slow
def test_train_step_decreases_loss():
    cfg = micro_config()
    model = VFDepthModel(cfg)
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(model, rng, batch, steps_per_epoch=100)
    step = build_train_step(model, tx, donate=False)

    state1, logs0 = step(state, batch, rng)
    l0 = float(logs0["total_loss"])
    losses = []
    for _ in range(20):
        state1, logs = step(state1, batch, rng)
        losses.append(float(logs["total_loss"]))
    assert np.isfinite(l0) and all(np.isfinite(l) for l in losses)
    assert min(losses[-5:]) < l0, f"loss did not decrease: {l0} -> {losses}"


@pytest.mark.slow
def test_dp_grad_equivalence():
    """1 device x batch 2 == 2 'devices' (sharded) x batch 1: same loss.

    The SPMD data-parallel step must be numerically equivalent to the
    single-device large-batch step (psum-of-grads == full-batch grad).
    """
    from vfdepth_tpu.parallel.mesh import make_mesh, shard_batch
    from vfdepth_tpu.training.step import shard_train_step

    cfg = micro_config()
    model = VFDepthModel(cfg)
    batch = _batch(cfg, batch_size=2)
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(model, rng, batch, steps_per_epoch=100)

    def loss_fn(params, b):
        _, (loss, _), _ = model.forward(params, state.batch_stats, b, rng,
                                        train=True)
        return loss

    # single-device loss+grad on the full batch
    g1_fn = jax.jit(jax.value_and_grad(loss_fn))
    l1, g1 = g1_fn(state.params, batch)

    # same computation with the batch sharded over 2 virtual devices — XLA
    # inserts the cross-device reductions; results must match numerically
    mesh = make_mesh(jax.devices()[:2])
    from vfdepth_tpu.parallel.mesh import replicated
    g2_fn = jax.jit(jax.value_and_grad(loss_fn),
                    in_shardings=(replicated(mesh), None))
    l2, g2 = g2_fn(state.params, shard_batch(mesh, batch))

    # The loss at a random init is CHAOTIC at the ~1e-3 level: discrete
    # automask/min-over-frames flips and small-count overlap masked means
    # amplify f32 noise. Measured (perturbation probe on this exact config):
    # a 1e-7 relative input perturbation moves the loss 1.5e-3 relative.
    # Two XLA compilations (partitioned vs not) differ by fused-multiply-add
    # association at that same 1e-7 level, so bitwise loss agreement is
    # unattainable; a REAL sharding bug (missing/doubled psum) shows as
    # O(0.1) relative. 5e-3 separates the two regimes by ~30x both ways.
    np.testing.assert_allclose(float(l1), float(l2), rtol=5e-3)
    # gradients agree in norm per leaf (elementwise compares flake on f32
    # reduction-order noise at ~1e-4; the semantic check is that the sharded
    # psum gradient equals the full-batch gradient)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    all1 = np.concatenate([np.asarray(x, np.float64).ravel() for x in flat1])
    all2 = np.concatenate([np.asarray(x, np.float64).ravel() for x in flat2])
    global_scale = np.linalg.norm(all1)
    diff_global = np.linalg.norm(all1 - all2)
    # At the symmetric init many gradient sums nearly cancel (bias grads sum
    # ~1e6 pixel terms to ~1e-4), so reduction-order noise can reach a few
    # percent of the (tiny) global norm while staying ~1e-5 absolute.
    # A real semantic divergence shows up as O(1) relative error.
    assert diff_global < 1e-3 + 0.05 * global_scale, (
        f"global grad divergence {diff_global} (scale {global_scale})")
    for a, b in zip(flat1, flat2):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        diff = np.linalg.norm(a - b)
        # Two inherent noise sources separate the (semantically identical)
        # GSPMD-partitioned and unpartitioned programs: (1) near-cancelling
        # reductions (bias grads summing ~1e6 pixel terms) carry absolute
        # reduction-order noise ~1e-4 of the global scale; (2) the automask
        # min(reproj, identity+noise) comparison is DISCRETE — measured: 2
        # of 12288 automask pixels flip between the two compilations,
        # each adding/removing one pixel's gradient (~1-2e-4 absolute on
        # ~1e-2-norm encoder leaves at the near-symmetric init; measured up
        # to 2.3e-4 = 4.4e-3 x global scale after the BEV-fold
        # reparameterization re-rolled the init stream). A real sharding
        # bug (missing/doubled psum) shows as diff ~ O(1) x the leaf's own
        # norm — 15x above this bound even on the smallest leaves.
        assert diff < 2e-2 * np.linalg.norm(a) + 6e-3 * global_scale, (
            f"grad divergence {diff} on leaf {a.shape}")


def test_pose_lr_boost_schedule():
    """The cold-start pose LR boost must (a) scale ONLY pose_net updates,
    (b) follow the linear fade factor exactly, and (c) become the reference
    Adam EXACTLY (factor 1.0, no residual scaling) once the fade completes —
    the converged optimizer is reference-parity (models/vfdepth.py:175-189),
    the boost is a transient of the from-scratch recipe only."""
    from vfdepth_tpu.training.step import make_optimizer

    params = {"depth_net": {"w": jnp.zeros(3)}, "pose_net": {"w": jnp.zeros(3)}}
    grads = {"depth_net": {"w": jnp.ones(3)}, "pose_net": {"w": jnp.ones(3)}}
    tx = make_optimizer(1e-2, 1000, 1, pose_boost=5.0,
                        boost_fade_start=3, boost_fade_steps=2)
    opt_state = tx.init(params)
    expected = [5.0, 5.0, 5.0, 5.0, 3.0, 1.0, 1.0, 1.0]  # factor(count)
    for i, want in enumerate(expected):
        updates, opt_state = tx.update(grads, opt_state, params)
        d, p = updates["depth_net"]["w"], updates["pose_net"]["w"]
        ratio = float(p[0] / d[0])
        assert abs(ratio - want) < 1e-6, (i, ratio, want)
        if want == 1.0:  # post-fade: bitwise identical to the base update
            assert np.array_equal(np.asarray(p), np.asarray(d)), i
    # pose_boost <= 1.0 short-circuits to plain Adam
    tx1 = make_optimizer(1e-2, 1000, 1, pose_boost=1.0)
    st1 = tx1.init(params)
    u1, _ = tx1.update(grads, st1, params)
    assert np.array_equal(np.asarray(u1["pose_net"]["w"]),
                          np.asarray(u1["depth_net"]["w"]))


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from vfdepth_tpu.training.checkpoint import save_checkpoint, load_checkpoint

    cfg = micro_config(depth_model="fsm", pose_model="fsm")
    model = VFDepthModel(cfg)
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(1)
    state, tx = create_train_state(model, rng, batch, steps_per_epoch=10)

    path = save_checkpoint(str(tmp_path), 0, state)
    # fresh state with different rng
    state2, _ = create_train_state(model, jax.random.PRNGKey(2), batch,
                                   steps_per_epoch=10)
    restored = load_checkpoint(path, state2)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # partial load: depth_net only
    partial = load_checkpoint(path, state2, models_to_load=["depth_net"],
                              load_optimizer=False)
    same = jax.tree_util.tree_leaves(partial.params["depth_net"])
    want = jax.tree_util.tree_leaves(state.params["depth_net"])
    for a, b in zip(same, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    diff = jax.tree_util.tree_leaves(partial.params["pose_net"])
    other = jax.tree_util.tree_leaves(state2.params["pose_net"])
    for a, b in zip(diff, other):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_remat_grad_equivalence():
    """remat=True (jax.checkpoint around net applies) must be a pure
    memory/time trade: identical loss and gradients to remat=False."""
    cfg = micro_config()
    cfg_r = micro_config()
    cfg_r.set("remat", True, section="tpu")

    batch = _batch(cfg)
    rng = jax.random.PRNGKey(0)

    def loss_and_grad(c):
        model = VFDepthModel(c)
        params, stats = model.init(jax.random.PRNGKey(1), batch)

        def loss_fn(p):
            _, (loss, _), _ = model.forward(p, stats, batch, rng, train=True)
            return loss

        return jax.jit(jax.value_and_grad(loss_fn))(params)

    l0, g0 = loss_and_grad(cfg)
    l1, g1 = loss_and_grad(cfg_r)
    assert np.allclose(float(l0), float(l1), rtol=1e-6, atol=1e-7)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_cam_axis_shard_equivalence():
    """(data=1, cam=3) 2-D mesh step == single-device step: sharding the
    camera axis (GSPMD partitions per-camera stages, psum at the fusion
    sums) must not change the math.

    Kept at 3 mesh devices / batch 1: with more virtual devices on this
    single-core test host the XLA:CPU collective rendezvous can hit its
    deadline and SIGABRT when the suite's other thread pools are resident
    (observed at (2, 3) in full-suite runs; fine in isolation)."""
    from vfdepth_tpu.parallel.mesh import make_mesh_2d, shard_batch_2d
    from vfdepth_tpu.training.step import shard_train_step_2d

    cfg = micro_config()
    model = VFDepthModel(cfg)
    batch = _batch(cfg, batch_size=1)
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(model, rng, batch, steps_per_epoch=10)

    step1 = build_train_step(model, tx, donate=False)
    _, logs1 = step1(state, batch, rng)
    l1 = float(logs1["total_loss"])

    mesh = make_mesh_2d(1, 3)
    step2 = shard_train_step_2d(model, tx, mesh, batch)
    _, logs2 = step2(state, shard_batch_2d(mesh, cfg.num_cams, batch), rng)
    l2 = float(logs2["total_loss"])

    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) < 1e-3 + 0.02 * abs(l1), (l1, l2)


@pytest.mark.slow
def test_checkpoint_cross_topology_restore(tmp_path):
    """A checkpoint saved under this process's 8-device topology must
    restore in a 1-device process (train on a pod -> eval on one chip).
    Regression: orbax refuses topology changes unless restored as numpy."""
    import subprocess
    import sys
    import os as _os
    from vfdepth_tpu.training.checkpoint import save_checkpoint

    cfg = micro_config()
    model = VFDepthModel(cfg)
    batch = _batch(cfg)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), batch,
                                  steps_per_epoch=10)
    path = save_checkpoint(str(tmp_path), 0, state)

    probe = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from vfdepth_tpu.training.checkpoint import _restore_as_numpy\n"
        f"t = _restore_as_numpy({path!r})\n"
        "import numpy as np\n"
        "leaves = jax.tree_util.tree_leaves(t['params'])\n"
        "assert leaves and all(np.isfinite(x).all() for x in leaves)\n"
        "print('restored', len(leaves), 'leaves')\n"
    )
    env = dict(_os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + _os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", probe], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "restored" in out.stdout


@pytest.mark.slow
def test_multihost_two_process_train_step():
    """Two localhost processes (1 CPU device each) run one sharded train
    step over a global 2-device mesh: jax.distributed init, loader shards
    from process_index, and the global-batch loss must equal a single-
    process batch-2 run (the psum-of-grads / global-BN semantics hold
    across hosts exactly as across local devices)."""
    import subprocess
    import sys as _sys
    import os as _os
    import re
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in _os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    env.pop("XLA_FLAGS", None)  # 1 device per process, no forced host count
    script = _os.path.join(_os.path.dirname(__file__), "helpers_dist_train.py")
    procs = [subprocess.Popen(
        [_sys.executable, script, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = [p.communicate(timeout=2400)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"dist proc failed:\n{out[-3000:]}"
    losses = [float(re.search(r"LOSS ([-\d.]+)", out).group(1)) for out in outs]
    assert losses[0] == losses[1]
    # the full Trainer loop (pod _build_step + pod-safe panel skip) completed
    for out in outs:
        assert "TRAINER_OK" in out, f"trainer loop failed:\n{out[-3000:]}"

    # single-process reference: global batch 2, same samples in the same
    # (shuffled, host-invariant) order as the 2-process run, same key
    # (fsm nets: the test exercises the distribution glue, not the model,
    # and the mono nets compile ~5x faster)
    cfg = micro_config(depth_model="fsm", pose_model="fsm")
    model = VFDepthModel(cfg)
    ds = FakeDataset(num_samples=2, num_cams=cfg.num_cams, height=cfg.height,
                     width=cfg.width, fusion_level=cfg.fusion_level)
    perm = np.random.RandomState(42).permutation(2)
    batch = {k: jnp.asarray(v)
             for k, v in ds.batch([int(i) for i in perm]).items()}
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(model, rng, batch, steps_per_epoch=10)
    step = build_train_step(model, tx, donate=False)
    _, logs = step(state, batch, rng)
    np.testing.assert_allclose(losses[0], float(logs["total_loss"]),
                               rtol=2e-4)


@pytest.mark.slow
def test_cam_data_mesh_equivalence_full():
    """(data=2, cam=3) combined data x camera sharding == unsharded step,
    asserted numerically. Runs in an isolated subprocess to dodge the
    in-suite XLA:CPU collective-rendezvous SIGABRT at data>1 (the same
    isolation trick as test_checkpoint_cross_topology_restore)."""
    import subprocess
    import sys as _sys
    import os as _os
    import re

    script = _os.path.join(_os.path.dirname(__file__), "helpers_mesh2d_equiv.py")
    env = dict(_os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([_sys.executable, script], capture_output=True,
                         text=True, timeout=1800, env=env)
    assert out.returncode == 0, f"subprocess failed:\n{out.stderr[-3000:]}"
    l1 = float(re.search(r"L1 ([-\d.]+)", out.stdout).group(1))
    l2 = float(re.search(r"L2 ([-\d.]+)", out.stdout).group(1))
    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) < 1e-3 + 0.02 * abs(l1), (l1, l2)
