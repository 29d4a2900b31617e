"""ResNet backbone tests: stride/rate plan, shapes, and exactness of the
space-to-batch execution mode vs plain dilated convolutions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv2019_tpu.models.resnet import (
    RESNET50_BLOCKS,
    ResNetV1,
    _batch_to_space,
    _space_to_batch,
    _unit_plan,
)

TINY4 = ((1, 16, 4), (1, 32, 8), (2, 64, 16), (1, 128, 32))


class TestUnitPlan:
    def test_resnet50_output_stride_8(self):
        plan = _unit_plan(RESNET50_BLOCKS, 8)
        # block1: normal strides, last unit strides 2
        assert [u[2] for u in plan[0]] == [1, 1, 2]
        assert all(u[3] == 1 for u in plan[0])
        # block2: all stride 1; rate still 1, next blocks dilate
        assert all(u[2] == 1 for u in plan[1])
        assert all(u[3] == 1 for u in plan[1])
        # block3: rate 2; block4: rate 4
        assert all(u[3] == 2 for u in plan[2])
        assert all(u[3] == 4 for u in plan[3])

    def test_output_stride_16(self):
        plan = _unit_plan(RESNET50_BLOCKS, 16)
        assert [u[2] for u in plan[1]] == [1, 1, 1, 2]
        assert all(u[3] == 1 for u in plan[2][:-1] + plan[1])
        assert all(u[3] == 2 for u in plan[3])

    def test_output_stride_32_no_dilation(self):
        plan = _unit_plan(RESNET50_BLOCKS, 32)
        assert all(u[3] == 1 for units in plan for u in units)


@pytest.mark.slow  # multi-second tier; see pytest.ini
class TestSpaceToBatch:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 12, 5).astype(np.float32))
        for f in (2, 4):
            y = _batch_to_space(_space_to_batch(x, f), f)
            np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_s2b_matches_dilated_exactly(self):
        """Dense convs on phase grids == dilated convs: same params, same output."""
        kw = dict(blocks=TINY4, output_stride=8, use_running_average=True,
                  dtype=jnp.float32)
        dil = ResNetV1(dilation_mode="dilated", **kw)
        s2b = ResNetV1(dilation_mode="space_to_batch", **kw)
        x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32))
        variables = dil.init(jax.random.PRNGKey(0), x)
        y_dil, _ = dil.apply(variables, x)
        y_s2b, _ = s2b.apply(variables, x)
        assert y_dil.shape == y_s2b.shape
        np.testing.assert_allclose(
            np.asarray(y_dil), np.asarray(y_s2b), rtol=1e-5, atol=1e-5
        )

    def test_s2b_matches_dilated_training_stats(self):
        """BatchNorm batch statistics are identical under phase decomposition."""
        kw = dict(blocks=TINY4, output_stride=8, use_running_average=False,
                  dtype=jnp.float32)
        dil = ResNetV1(dilation_mode="dilated", **kw)
        s2b = ResNetV1(dilation_mode="space_to_batch", **kw)
        x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3).astype(np.float32))
        variables = dil.init(jax.random.PRNGKey(0), x)
        (y1, _), m1 = dil.apply(variables, x, mutable=["batch_stats"])
        (y2, _), m2 = s2b.apply(variables, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(m1), jax.tree_util.tree_leaves(m2)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_fallback_on_indivisible_input(self):
        kw = dict(blocks=TINY4, output_stride=8, use_running_average=True,
                  dtype=jnp.float32)
        s2b = ResNetV1(dilation_mode="space_to_batch", **kw)
        # 24x24 -> stride-8 grid 3x3, not divisible by rate 4 -> dilated path
        x = jnp.zeros((1, 24, 24, 3), jnp.float32)
        variables = s2b.init(jax.random.PRNGKey(0), x)
        y, _ = s2b.apply(variables, x)
        assert y.shape[1] == 3


def test_resnet50_shapes():
    model = ResNetV1(output_stride=8, use_running_average=True, dtype=jnp.float32,
                     blocks=((1, 32, 8), (1, 64, 16)))
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    y, eps = model.apply(variables, x)
    assert y.shape == (1, 8, 16, 64)  # stride 8
    assert "root" in eps and "block1" in eps


class TestRootConvS2D:
    """Space-to-depth root conv: identical math + identical parameter tree."""

    def test_equivalence_and_param_path(self):
        import numpy as np
        import jax
        import jax.numpy as jnp

        from iv2019_tpu.models.layers import ConvSame
        from iv2019_tpu.models.resnet import RootConvS2D

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
        ref = ConvSame(64, 7, 2, dtype=jnp.float32)
        v = ref.init(jax.random.PRNGKey(0), x)
        s2d = RootConvS2D(64, 7, 2, dtype=jnp.float32)
        # same tree: a ConvSame checkpoint loads directly
        vs = s2d.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vs)
        assert v["params"]["conv"]["kernel"].shape == (7, 7, 3, 64)
        y_ref = ref.apply(v, x)
        y_s2d = s2d.apply(v, x)
        assert y_s2d.shape == y_ref.shape
        np.testing.assert_allclose(
            np.asarray(y_s2d), np.asarray(y_ref), rtol=1e-5, atol=1e-5
        )

    def test_odd_input_falls_back(self):
        import jax
        import jax.numpy as jnp

        from iv2019_tpu.models.resnet import ResNetV1

        m = ResNetV1(
            blocks=((1, 8, 4),), output_stride=4, root_conv_s2d=True,
            use_running_average=True, dtype=jnp.float32,
        )
        x = jnp.zeros((1, 33, 31, 3), jnp.float32)  # odd dims -> ConvSame path
        v = m.init(jax.random.PRNGKey(0), x)
        y, _ = m.apply(v, x)
        assert y.shape[0] == 1
