"""Gradient accumulation (--grad_accum_steps) and backbone remat (--remat).

Two of the three memory levers for megapixel training (with
--spatial_partitions; rows in tools/spatial_memory_table.py):

- grad_accum_steps=N scans N sequential microbatches per optimizer step,
  averaging gradients. The weighted losses normalize per microbatch
  (sum(w*l)/count(w) over the slice — the standard accumulation semantics
  for dynamically-gated losses), so the update matches the monolithic step
  to ~1e-4 relative on random data — pinned here with group norm (no
  batch-stat coupling between examples). With batch norm the microbatch
  statistics additionally differ by design (the Nb/N semantics); pinned to
  run and learn.
- remat=True (jax.checkpoint per bottleneck unit) is numerically identical
  by construction — pinned bit-exact against the plain step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv2019_tpu.train.optimizer import make_optimizer
from iv2019_tpu.train.state import create_train_state
from iv2019_tpu.train.step import make_train_step

from helpers import synthetic_batch, tiny_model, tiny_settings

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini


def _run_step(settings, variables, batch):
    model = tiny_model(settings, train=True)
    tx, _ = make_optimizer(settings)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.asarray, variables), tx, settings.ema_decay
    )
    step_fn = make_train_step(settings, model=model, tx=tx)
    new_state, metrics = step_fn(state, batch)
    return new_state, metrics


@pytest.fixture(scope="module")
def group_setup():
    settings = tiny_settings(norm_layer="group", Nb_per_pixel=4, Nb_per_bbox=4,
                             Nb_per_image=4, Nb=4)
    model = tiny_model(settings, train=True)
    x = jnp.zeros((2, 32, 64, 3), jnp.float32)
    variables = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0), x)
    )
    return settings, variables


class TestGradAccumExact:
    def test_groupnorm_accum_equals_full_batch(self, group_setup):
        """accum=2 must reproduce the accum=1 update up to the weighted-loss
        normalizer (per-microbatch gated-pixel counts): ~1e-4 relative."""
        settings, variables = group_setup
        batch = synthetic_batch(settings)
        s1, m1 = _run_step(settings, variables, batch)
        s2, m2 = _run_step(
            settings.replace(grad_accum_steps=2), variables, batch
        )
        for k in ("total", "l1_segmentation", "l2_vehicle_segmentation",
                  "l2_human_segmentation", "regularization", "miou"):
            np.testing.assert_allclose(
                float(m1[k]), float(m2[k]), rtol=1e-3, atol=1e-6, err_msg=k
            )
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s2.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5,
                err_msg=str(p1),
            )

    def test_weight_mask_summaries_match(self, group_setup):
        """The summary masks must show the same examples as the accum=1 step
        (microbatch 0 holds pp[0] and the first weak image)."""
        settings, variables = group_setup
        batch = synthetic_batch(settings)
        _, m1 = _run_step(settings, variables, batch)
        _, m2 = _run_step(
            settings.replace(grad_accum_steps=2), variables, batch
        )
        for k, v in m1["weight_masks"].items():
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(m2["weight_masks"][k]),
                atol=1e-6, err_msg=k,
            )

    def test_four_way_split(self, group_setup):
        settings, variables = group_setup
        batch = synthetic_batch(settings)
        s1, m1 = _run_step(settings, variables, batch)
        s4, m4 = _run_step(
            settings.replace(grad_accum_steps=4), variables, batch
        )
        np.testing.assert_allclose(
            float(m1["total"]), float(m4["total"]), rtol=1e-3, atol=1e-6
        )
        a = jax.tree_util.tree_leaves(s1.params)[0]
        b = jax.tree_util.tree_leaves(s4.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-5)


class TestGradAccumBatchNorm:
    def test_runs_and_advances_stats(self):
        settings = tiny_settings(grad_accum_steps=2)
        model = tiny_model(settings, train=True)
        x = jnp.zeros((2, 32, 64, 3), jnp.float32)
        variables = jax.tree_util.tree_map(
            np.asarray, model.init(jax.random.PRNGKey(0), x)
        )
        bs0 = jax.tree_util.tree_leaves(variables["batch_stats"])[0].copy()
        new_state, metrics = _run_step(settings, variables, synthetic_batch(settings))
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["total"]))
        assert 0.0 <= float(metrics["miou"]) <= 1.0
        bs1 = np.asarray(jax.tree_util.tree_leaves(new_state.batch_stats)[0])
        assert not np.allclose(bs0, bs1)

    def test_divisibility_validated(self):
        with pytest.raises(ValueError, match="grad_accum_steps"):
            tiny_settings(grad_accum_steps=3)  # does not divide Nb_per_*=2


class TestRematExact:
    def test_remat_step_bit_identical(self):
        settings = tiny_settings()
        model = tiny_model(settings, train=True)
        x = jnp.zeros((2, 32, 64, 3), jnp.float32)
        variables = jax.tree_util.tree_map(
            np.asarray, model.init(jax.random.PRNGKey(0), x)
        )
        batch = synthetic_batch(settings)
        s0, m0 = _run_step(settings, variables, batch)
        s1, m1 = _run_step(settings.replace(remat=True), variables, batch)
        # same param tree (checkpoint compatibility) and identical update
        assert jax.tree_util.tree_structure(s0.params) == (
            jax.tree_util.tree_structure(s1.params)
        )
        np.testing.assert_allclose(float(m0["total"]), float(m1["total"]),
                                   rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                        jax.tree_util.tree_leaves(s1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_remat_composes_with_accum(self):
        settings = tiny_settings(remat=True, grad_accum_steps=2)
        model = tiny_model(settings, train=True)
        x = jnp.zeros((2, 32, 64, 3), jnp.float32)
        variables = jax.tree_util.tree_map(
            np.asarray, model.init(jax.random.PRNGKey(0), x)
        )
        new_state, metrics = _run_step(settings, variables, synthetic_batch(settings))
        assert np.isfinite(float(metrics["total"]))


class TestMemoryReduction:
    def test_accum_and_remat_cut_temp_memory(self):
        """AOT memory analysis: each lever must reduce XLA's temp (activation)
        allocation on the same config — the property the size-ceiling table
        (docs/PERFORMANCE.md) is built on."""
        import os
        import sys

        if jax.device_count() < 8:
            pytest.skip("needs the 8-device CPU mesh")
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
        ))
        from spatial_memory_table import analyze

        # large enough that activations dominate the fixed overheads (the
        # params-sized gradient accumulator; at tiny sizes accumulation
        # cannot help — the levers target megapixel configs). nb=16/accum=2
        # keeps every microbatch evenly sharded over the 8 batch shards
        # (make_train_step rejects smaller slices).
        base = analyze(256, 512, 1, nb=16)
        accum = analyze(256, 512, 1, nb=16, accum=2)
        assert accum["temp_gb"] < 0.75 * base["temp_gb"], (base, accum)
        # remat is asserted for exactness only: XLA:CPU's scheduler shows no
        # temp reduction for per-unit checkpointing (measured neutral-to-
        # worse; docs/PERFORMANCE.md) — its memory effect is a property of
        # the TPU compiler's scheduling and is validated there, not here.
