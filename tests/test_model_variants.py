"""Model configuration variants: PSP, group norm, hybrid upsampling, FOV conv."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iv2019_tpu.models.model import HierarchicalSegmentationModel
from iv2019_tpu.problem.taxonomy import get_taxonomy

from helpers import TINY_BLOCKS

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini


def _model(**kw):
    defaults = dict(
        taxonomy=get_taxonomy("cityscapes"),
        resnet_blocks=TINY_BLOCKS,
        feature_dims_decreased=16,
        accumulate_norm_statistics=False,
        dtype=jnp.float32,
    )
    defaults.update(kw)
    return HierarchicalSegmentationModel(**defaults)


def _run(model, h=48, w=96):
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model.apply(variables, x), variables


class TestVariants:
    def test_psp_module(self):
        preds, variables = _run(_model(psp_module=True))
        assert preds["l1_logits"].shape == (1, 48, 96, 14)
        names = str(jax.tree_util.tree_structure(variables["params"]))
        assert "pyramid_module" in names

    def test_group_norm(self):
        preds, variables = _run(_model(norm_type="group"))
        assert preds["decisions"].shape == (1, 48, 96)
        # no batch_stats collection with group norm
        assert not variables.get("batch_stats")

    def test_hybrid_upsampling(self):
        preds, variables = _run(_model(upsampling_method="hybrid"))
        assert preds["l1_logits"].shape == (1, 48, 96, 14)
        names = str(jax.tree_util.tree_structure(variables["params"]))
        assert "conv_transpose" in names

    def test_no_upsampling(self):
        preds, _ = _run(_model(upsampling_method="no"))
        # logits stay at stride-8 resolution
        assert preds["l1_logits"].shape == (1, 6, 12, 14)
        assert preds["decisions"].shape == (1, 6, 12)

    def test_fov_expansion(self):
        preds, variables = _run(
            _model(fov_expansion_kernel_size=3, fov_expansion_kernel_rate=2)
        )
        names = str(jax.tree_util.tree_structure(variables["params"]))
        assert "increase_fov" in names
        assert preds["decisions"].shape == (1, 48, 96)

    def test_vistas_heads(self):
        preds, _ = _run(_model(taxonomy=get_taxonomy("vistas")))
        assert preds["l1_logits"].shape[-1] == 53
        assert preds["l2_vehicle_logits"].shape[-1] == 12
        assert preds["l2_human_logits"].shape[-1] == 5
        assert int(jnp.max(preds["decisions"])) <= 65
