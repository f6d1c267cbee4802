"""Sharded training-step tests on the 8-virtual-device CPU mesh (the
TPU-native analogue of a fake backend, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.models.sopro import init_sopro_model
from sopro_tpu.parallel import make_mesh, param_shardings
from sopro_tpu.train import (
    TrainBatch,
    loss_fn,
    make_optimizer,
    make_train_step,
    shard_train_state,
)


# CI lane: these modules dominate suite wall-clock (compile-heavy); run them
# via `just test-all`; `just test` runs -m "not slow" (<5 min)
pytestmark = pytest.mark.slow

CFG = SoproTTSConfig(
    d_model=64,
    n_layers_text=1,
    n_layers_ar=2,
    n_layers_nar=2,
    ref_enc_layers=1,
    ref_xattn_layers=1,
    max_frames=16,
    num_codebooks=8,
    codebook_size=32,
    nar_head_dim=32,
    stage_B=(2, 3),
    stage_C=(4, 5),
    stage_D=(6, 7),
    stage_E=(8, 8),
    sv_student_dim=16,
)


def _batch(rng, b=8, l=10, tr=6, s=12):
    lengths = rng.integers(4, s + 1, size=(b,))
    return TrainBatch(
        text_ids=jnp.asarray(rng.integers(0, 64, (b, l)), jnp.int32),
        text_mask=jnp.ones((b, l), bool),
        ref_tokens=jnp.asarray(
            rng.integers(0, CFG.codebook_size, (b, tr, CFG.num_codebooks)), jnp.int32
        ),
        ref_mask=jnp.ones((b, tr), bool),
        frames=jnp.asarray(
            rng.integers(0, CFG.codebook_size, (b, s, CFG.num_codebooks)), jnp.int32
        ),
        frame_mask=jnp.asarray(np.arange(s)[None] < lengths[:, None]),
    )


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_training_loss_decreases(rng):
    params = init_sopro_model(jax.random.PRNGKey(0), CFG, text_vocab_size=64)
    optimizer = make_optimizer(lr=1e-3)
    opt_state = optimizer.init(params)
    batch = _batch(rng)

    mesh = make_mesh(8)
    with mesh:
        params, opt_state, batch = shard_train_state(mesh, params, opt_state, batch)
        step = jax.jit(make_train_step(CFG, optimizer))
        losses = []
        for _ in range(5):
            params, opt_state, metrics = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


def test_sharded_loss_matches_single_device(rng):
    """The dp/tp-sharded loss must equal the unsharded loss (GSPMD is a
    layout, not a numerics change)."""
    params = init_sopro_model(jax.random.PRNGKey(1), CFG, text_vocab_size=64)
    batch = _batch(rng)

    loss_plain, _ = jax.jit(lambda p, b: loss_fn(p, CFG, b))(params, batch)

    mesh = make_mesh(8, dp=4, tp=2)
    with mesh:
        pshard = param_shardings(mesh, params)
        params_s = jax.device_put(params, pshard)
        from sopro_tpu.parallel.mesh import batch_sharding

        batch_s = TrainBatch(
            *(jax.device_put(x, batch_sharding(mesh)) for x in batch)
        )
        loss_shard, _ = jax.jit(lambda p, b: loss_fn(p, CFG, b))(params_s, batch_s)

    np.testing.assert_allclose(
        float(loss_plain), float(loss_shard), rtol=2e-5
    )


def test_train_checkpoint_resume_sharded(rng, tmp_path):
    """Training checkpoint/resume (SURVEY.md §5): save a sharded train state
    mid-run, restore it into a FRESH sharded state (different mesh shape than
    the save-side layout), and verify bit-identical params/moments plus a
    finite continued step."""
    from sopro_tpu.train import restore_train_checkpoint, save_train_checkpoint

    params = init_sopro_model(jax.random.PRNGKey(0), CFG, text_vocab_size=64)
    optimizer = make_optimizer(lr=1e-3)
    opt_state = optimizer.init(params)
    batch = _batch(rng)

    mesh = make_mesh(8)
    with mesh:
        params, opt_state, batch = shard_train_state(mesh, params, opt_state, batch)
        step = jax.jit(make_train_step(CFG, optimizer))
        for _ in range(2):
            params, opt_state, metrics = step(params, opt_state, batch)
    ck = str(tmp_path / "ck")
    save_train_checkpoint(ck, params, opt_state, step=2)

    # fresh template state (as a cold resume would build it) + a different
    # mesh layout than the one that saved
    params_like = init_sopro_model(jax.random.PRNGKey(9), CFG, text_vocab_size=64)
    opt_like = optimizer.init(params_like)
    mesh2 = make_mesh(8, dp=4, tp=2)
    params_r, opt_r, step_no = restore_train_checkpoint(
        ck, params_like, opt_like, mesh=mesh2
    )
    assert step_no == 2

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params_r, params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        opt_r, opt_state,
    )

    with mesh2:
        batch2 = _batch(np.random.default_rng(5))
        from sopro_tpu.parallel.mesh import batch_sharding

        batch2 = TrainBatch(
            *(jax.device_put(x, batch_sharding(mesh2)) for x in batch2)
        )
        step2 = jax.jit(make_train_step(CFG, optimizer))
        _, _, metrics = step2(params_r, opt_r, batch2)
    assert np.isfinite(float(metrics["loss"]))


def test_param_sharding_rules():
    params = init_sopro_model(jax.random.PRNGKey(0), CFG, text_vocab_size=64)
    mesh = make_mesh(8, dp=4, tp=2)
    shardings = param_shardings(mesh, params)
    # FFN expansion must actually shard over tp
    s = shardings["ar"]["blocks"][0]["ff1"]["w"]
    assert "tp" in str(s.spec), s.spec
    # odd-sized leaves fall back to replication rather than erroring
    s_gate = shardings["ref_xattn"][0]["gate"]
    assert s_gate.spec == jax.sharding.PartitionSpec()


def test_param_sharding_partitions_flagship_shapes():
    """At the FLAGSHIP config (d_model=384, 4x FFN=1536, 2049-vocab head)
    the tp rules must actually partition the wide matmuls — the toy shapes
    used elsewhere could mask a divisibility fallback silently replicating
    production weights (parallel/mesh.py guard)."""
    cfg = SoproTTSConfig()
    params = init_sopro_model(jax.random.PRNGKey(0), cfg, text_vocab_size=2048)
    mesh = make_mesh(8, dp=4, tp=2)
    shardings = param_shardings(mesh, params)

    def shard_frac(path, leaf):
        s = shardings
        for k in path:
            s = s[k]
        placed = jax.device_put(leaf, s)
        local = placed.addressable_shards[0].data.shape
        return np.prod(local) / np.prod(leaf.shape), s.spec

    # the wide FFN / GLU matmuls partition their hidden axis 2-way
    for path in (
        ("ar", "blocks", 0, "ff1", "w"),      # [384, 1536]
        ("ar", "blocks", 0, "glu", "pro", "w"),  # [384, 768]
        ("nar", "blocks", 0, "ff1", "w"),
    ):
        leaf = params
        for k in path:
            leaf = leaf[k]
        frac, spec = shard_frac(path, leaf)
        assert frac == 0.5, (path, spec, leaf.shape, frac)
    # the big fused codebook embedding ([65537, 384] — odd rows) falls back
    # to sharding its d_model axis instead of replicating ~100 MB
    frac, spec = shard_frac(
        ("cb_embed", "emb"), params["cb_embed"]["emb"]
    )
    assert frac == 0.5, (spec, params["cb_embed"]["emb"].shape)
    # the 2049-vocab AR head is odd on its vocab axis: the fallback rule
    # shards the d_model input axis instead
    frac, spec = shard_frac(("ar", "head", "w"), params["ar"]["head"]["w"])
    assert frac == 0.5 and spec == jax.sharding.PartitionSpec("tp", None), (
        spec, params["ar"]["head"]["w"].shape,
    )
