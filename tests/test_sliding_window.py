"""Sliding-window (native-resolution) evaluation — a beyond-reference
capability: tile an ``eval_size`` image with (hf, wf) windows, stitch the
hierarchically-factorized common-space probabilities on a canvas, argmax in
the evaluation label space (train/step._make_window_eval_step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iv2019_tpu.config import build_argparser, settings_from_args
from iv2019_tpu.models.model import hierarchical_common_probabilities
from iv2019_tpu.ops.confusion import confusion_matrix
from iv2019_tpu.problem.taxonomy import get_taxonomy
from iv2019_tpu.train.step import make_eval_step, window_origins

from helpers import tiny_model, tiny_settings

pytestmark = pytest.mark.slow  # multi-second tier; see pytest.ini


def test_window_origins_cover_and_clamp():
    # exact tiling at overlap 0
    assert window_origins(64, 32, 0.0) == [0, 32]
    # 50% overlap
    assert window_origins(64, 32, 0.5) == [0, 16, 32]
    # non-divisible extent: last window clamps flush to the edge
    assert window_origins(70, 32, 0.5) == [0, 16, 32, 38]
    # window >= image: single window
    assert window_origins(32, 32, 0.5) == [0]
    assert window_origins(20, 32, 0.5) == [0]
    # every pixel covered for a fuzz of configurations
    for full, win, ov in [(100, 32, 0.3), (57, 16, 0.5), (128, 64, 0.75)]:
        cov = np.zeros(full)
        for o in window_origins(full, win, ov):
            assert 0 <= o <= full - win
            cov[o : o + win] += 1
        assert (cov > 0).all()


def test_validation():
    with pytest.raises(ValueError, match="sliding_window needs"):
        tiny_settings(sliding_window=True)
    with pytest.raises(ValueError, match="must be >= the window size"):
        tiny_settings(sliding_window=True, eval_size=(16, 16))
    with pytest.raises(ValueError, match="window_overlap"):
        tiny_settings(window_overlap=1.0)
    with pytest.raises(ValueError, match="spatial_partitions"):
        tiny_settings(
            sliding_window=True, eval_size=(64, 128), spatial_partitions=2
        )
    # eval_size alone (plain native-resolution eval) is valid
    s = tiny_settings(eval_size=(64, 128))
    assert s.eval_size == (64, 128)


def test_cli_flags():
    p = build_argparser("eval")
    args = p.parse_args(
        ["log", "16", "prob.json", "--eval_size", "64", "128",
         "--sliding_window", "--window_overlap", "0.25"]
    )
    s = settings_from_args(args, "eval")
    assert s.eval_size == (64, 128)
    assert s.sliding_window is True
    assert s.window_overlap == 0.25


@pytest.fixture(scope="module")
def tiny_eval():
    settings = tiny_settings()
    model = tiny_model(settings, train=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3), jnp.float32)
    )
    return settings, model, variables


def _probs(model, variables, images, tax):
    preds = model.apply(variables, images)
    return hierarchical_common_probabilities(preds, tax)


def test_single_window_matches_direct_forward(tiny_eval):
    """eval_size == window size -> one window; the stitched result must equal
    the direct factorized-probability argmax on the whole image."""
    settings, model, variables = tiny_eval
    tax = get_taxonomy(settings.per_pixel_dataset_name)
    s = settings.replace(mode="eval", sliding_window=True, eval_size=(32, 64))
    fn = make_eval_step(s, model=model, tcids2ecids=list(range(19)) + [-1])
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (2, 32, 64)).astype(np.int32))
    cm = fn(variables["params"], variables["batch_stats"], images, labels)

    decs = jnp.argmax(_probs(model, variables, images, tax), -1).astype(jnp.int32)
    cm_manual = confusion_matrix(labels, decs, 20)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cm_manual))


def test_disjoint_windows_match_per_quadrant_forward(tiny_eval):
    """overlap=0 with an exactly-tiling eval_size: each quadrant's stitched
    probabilities equal an independent forward of that quadrant."""
    settings, model, variables = tiny_eval
    tax = get_taxonomy(settings.per_pixel_dataset_name)
    s = settings.replace(
        mode="eval", sliding_window=True, eval_size=(64, 128),
        window_overlap=0.0,
    )
    fn = make_eval_step(s, model=model, tcids2ecids=list(range(19)) + [-1])
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 64, 128, 3)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (1, 64, 128)).astype(np.int32))
    cm = fn(variables["params"], variables["batch_stats"], images, labels)

    # stitch manually from 4 disjoint window forwards
    decs = np.zeros((1, 64, 128), np.int32)
    for oy in (0, 32):
        for ox in (0, 64):
            win = images[:, oy : oy + 32, ox : ox + 64, :]
            p = _probs(model, variables, win, tax)
            decs[:, oy : oy + 32, ox : ox + 64] = np.asarray(
                jnp.argmax(p, -1)
            )
    cm_manual = confusion_matrix(labels, jnp.asarray(decs), 20)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cm_manual))


def test_overlapping_windows_average_probabilities(tiny_eval):
    """50% overlap: a pixel covered by two windows must carry the average of
    both windows' distributions (checked via the confusion-matrix decisions
    of a manually-stitched canvas)."""
    settings, model, variables = tiny_eval
    tax = get_taxonomy(settings.per_pixel_dataset_name)
    s = settings.replace(
        mode="eval", sliding_window=True, eval_size=(32, 96),
        window_overlap=0.5,
    )
    fn = make_eval_step(s, model=model, tcids2ecids=list(range(19)) + [-1])
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 32, 96, 3)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (1, 32, 96)).astype(np.int32))
    cm = fn(variables["params"], variables["batch_stats"], images, labels)

    # width-64 windows over a 96-wide image at 50% overlap -> origins 0, 32
    canvas = np.zeros((1, 32, 96, tax.num_common_classes), np.float32)
    count = np.zeros((1, 32, 96, 1), np.float32)
    for ox in (0, 32):
        win = images[:, :, ox : ox + 64, :]
        canvas[:, :, ox : ox + 64] += np.asarray(
            _probs(model, variables, win, tax)
        )
        count[:, :, ox : ox + 64] += 1.0
    decs = jnp.asarray(np.argmax(canvas / count, -1).astype(np.int32))
    cm_manual = confusion_matrix(labels, decs, 20)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cm_manual))


def test_sliding_window_composes_with_flip(tiny_eval):
    """eval_size == window size + eval_flip: the stitched ensemble must equal
    the average of the direct and mirrored forwards' distributions."""
    settings, model, variables = tiny_eval
    tax = get_taxonomy(settings.per_pixel_dataset_name)
    s = settings.replace(
        mode="eval", sliding_window=True, eval_size=(32, 64), eval_flip=True
    )
    fn = make_eval_step(s, model=model, tcids2ecids=list(range(19)) + [-1])
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (2, 32, 64)).astype(np.int32))
    cm = fn(variables["params"], variables["batch_stats"], images, labels)

    p = _probs(model, variables, images, tax)
    pf = _probs(model, variables, images[:, :, ::-1, :], tax)[:, :, ::-1, :]
    decs = jnp.argmax(p + pf, -1).astype(jnp.int32)
    cm_manual = confusion_matrix(labels, decs, 20)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cm_manual))


def test_sliding_window_composes_with_scales(tiny_eval):
    """Multi-scale sliding window: each scale tiles its own rescaled image
    (clamped to at least the window size), the canvases are resized back to
    eval_size and averaged."""
    from iv2019_tpu.ops.resize import resize_bilinear_mxu
    from iv2019_tpu.train.step import window_origins

    settings, model, variables = tiny_eval
    tax = get_taxonomy(settings.per_pixel_dataset_name)
    s = settings.replace(
        mode="eval", sliding_window=True, eval_size=(32, 96),
        window_overlap=0.0, eval_scales=(0.5, 1.0),
    )
    fn = make_eval_step(s, model=model, tcids2ecids=list(range(19)) + [-1])
    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 32, 96, 3)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (1, 32, 96)).astype(np.int32))
    cm = fn(variables["params"], variables["batch_stats"], images, labels)

    # manual ensemble: stride=8, window (32, 64)
    acc = np.zeros((1, 32, 96, tax.num_common_classes), np.float32)
    for sc in (0.5, 1.0):
        sh = max(int(round(32 * sc / 8)) * 8, 32)
        sw = max(int(round(96 * sc / 8)) * 8, 64)
        im = (
            resize_bilinear_mxu(images, (sh, sw), align_corners=True)
            if (sh, sw) != (32, 96) else images
        )
        canvas = np.zeros((1, sh, sw, tax.num_common_classes), np.float32)
        count = np.zeros((1, sh, sw, 1), np.float32)
        for oy in window_origins(sh, 32, 0.0):
            for ox in window_origins(sw, 64, 0.0):
                win = im[:, oy : oy + 32, ox : ox + 64, :]
                canvas[:, oy : oy + 32, ox : ox + 64] += np.asarray(
                    _probs(model, variables, win, tax)
                )
                count[:, oy : oy + 32, ox : ox + 64] += 1.0
        p = jnp.asarray(canvas / count)
        if (sh, sw) != (32, 96):
            p = resize_bilinear_mxu(p, (32, 96), align_corners=True)
        acc += np.asarray(p)
    decs = jnp.asarray(np.argmax(acc, -1).astype(np.int32))
    cm_manual = confusion_matrix(labels, decs, 20)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cm_manual))


def test_eval_size_plain_native_resolution(tiny_eval):
    """eval_size without sliding_window: the base eval graph runs the fully-
    convolutional forward at the larger size directly."""
    settings, model, variables = tiny_eval
    s = settings.replace(mode="eval", eval_size=(64, 128))
    fn = make_eval_step(s, model=model, tcids2ecids=list(range(19)) + [-1])
    images = jnp.zeros((1, 64, 128, 3), jnp.float32)
    labels = jnp.zeros((1, 64, 128), jnp.int32)
    cm = fn(variables["params"], variables["batch_stats"], images, labels)
    assert cm.shape == (20, 20)
    assert int(np.asarray(cm).sum()) == 64 * 128


def test_window_weight_maps():
    from iv2019_tpu.train.step import window_weight

    u = window_weight(8, 16, "uniform")
    assert u.shape == (8, 16, 1) and (u == 1.0).all()
    g = window_weight(32, 64, "gaussian")
    assert g.shape == (32, 64, 1)
    assert g.max() == 1.0  # normalized peak
    # peak at the center, floored tails, symmetric
    assert g[15:17, 31:33].min() > 0.9
    assert g.min() >= 1e-3
    np.testing.assert_allclose(g, g[::-1], atol=1e-6)
    np.testing.assert_allclose(g, g[:, ::-1], atol=1e-6)
    with pytest.raises(ValueError, match="window_blend"):
        window_weight(8, 8, "bogus")


def test_gaussian_blend_single_window_invariant(tiny_eval):
    """With one window the Gaussian weight cancels (p*w / w): decisions must
    equal the direct forward exactly, pinning the blend normalization."""
    settings, model, variables = tiny_eval
    tax = get_taxonomy(settings.per_pixel_dataset_name)
    s = settings.replace(
        mode="eval", sliding_window=True, eval_size=(32, 64),
        window_blend="gaussian",
    )
    fn = make_eval_step(s, model=model, tcids2ecids=list(range(19)) + [-1])
    rng = np.random.RandomState(8)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 32, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (1, 32, 64)).astype(np.int32))
    cm = fn(variables["params"], variables["batch_stats"], images, labels)

    decs = jnp.argmax(_probs(model, variables, images, tax), -1).astype(jnp.int32)
    cm_manual = confusion_matrix(labels, decs, 20)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cm_manual))


def test_gaussian_blend_overlapping_windows(tiny_eval):
    """50% overlap with Gaussian blending: overlapped pixels must carry the
    weight-blended distribution (manual canvas check)."""
    from iv2019_tpu.train.step import window_weight

    settings, model, variables = tiny_eval
    tax = get_taxonomy(settings.per_pixel_dataset_name)
    s = settings.replace(
        mode="eval", sliding_window=True, eval_size=(32, 96),
        window_overlap=0.5, window_blend="gaussian",
    )
    fn = make_eval_step(s, model=model, tcids2ecids=list(range(19)) + [-1])
    rng = np.random.RandomState(9)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 32, 96, 3)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (1, 32, 96)).astype(np.int32))
    cm = fn(variables["params"], variables["batch_stats"], images, labels)

    w = window_weight(32, 64, "gaussian")
    canvas = np.zeros((1, 32, 96, tax.num_common_classes), np.float32)
    count = np.zeros((1, 32, 96, 1), np.float32)
    for ox in (0, 32):
        win = images[:, :, ox : ox + 64, :]
        canvas[:, :, ox : ox + 64] += np.asarray(
            _probs(model, variables, win, tax)
        ) * w
        count[:, :, ox : ox + 64] += w
    decs = jnp.asarray(np.argmax(canvas / count, -1).astype(np.int32))
    cm_manual = confusion_matrix(labels, decs, 20)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cm_manual))


def test_window_predict_single_window_matches_base(tiny_eval):
    """Sliding-window predict with eval_size == window size: one window, so
    the stitched per-head probabilities equal the direct forward's and the
    re-derived fusion equals the model's own decisions."""
    from iv2019_tpu.train.step import make_predict_step

    settings, model, variables = tiny_eval
    s = settings.replace(mode="predict", sliding_window=True, eval_size=(32, 64))
    fn = make_predict_step(s, model=model)
    rng = np.random.RandomState(5)
    images = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, 3)).astype(np.float32))
    out = fn(variables["params"], variables["batch_stats"], images)

    preds = model.apply(variables, images)
    for k in ("l1_probabilities", "l2_vehicle_probabilities",
              "l2_human_probabilities"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(preds[k]), atol=1e-5
        )
    np.testing.assert_array_equal(
        np.asarray(out["decisions"]), np.asarray(preds["decisions"])
    )


def test_tta_predict_flip_averages_heads(tiny_eval):
    """--eval_flip at predict: per-head probabilities must be the average of
    the direct and mirrored forwards."""
    from iv2019_tpu.train.step import make_predict_step

    settings, model, variables = tiny_eval
    s = settings.replace(mode="predict", eval_flip=True)
    fn = make_predict_step(s, model=model)
    rng = np.random.RandomState(6)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 32, 64, 3)).astype(np.float32))
    out = fn(variables["params"], variables["batch_stats"], images)

    p = model.apply(variables, images)
    pf = model.apply(variables, images[:, :, ::-1, :])
    for k in ("l1_probabilities", "l2_vehicle_probabilities",
              "l2_human_probabilities"):
        expected = (np.asarray(p[k]) + np.asarray(pf[k])[:, :, ::-1, :]) / 2
        np.testing.assert_allclose(np.asarray(out[k]), expected, atol=1e-5)


def test_predict_cli_flags():
    p = build_argparser("predict")
    args = p.parse_args(
        ["log", "prob.json", "/tmp/imgs", "--eval_size", "64", "128",
         "--sliding_window", "--eval_flip"]
    )
    s = settings_from_args(args, "predict")
    assert s.eval_size == (64, 128)
    assert s.sliding_window is True
    assert s.eval_flip is True


def test_dataset_agnostic_input_honors_eval_size(tmp_path):
    from PIL import Image

    from iv2019_tpu.input.dataset_agnostic import predict_input

    rng = np.random.RandomState(7)
    Image.fromarray(
        rng.randint(0, 255, (100, 200, 3), dtype=np.uint8)
    ).save(tmp_path / "a.png")
    s = tiny_settings(eval_size=(64, 128)).replace(
        mode="predict", predict_dir=str(tmp_path)
    )
    batch = next(iter(predict_input(s)))
    assert batch["proimages"].shape == (1, 64, 128, 3)
    assert batch["rawimages"].shape == (100, 200, 3)


def test_window_eval_on_data_mesh_matches_single_device(tiny_eval):
    """Sliding-window eval is SPMD-compatible: over the 8-device data mesh
    (batch sharded, windows sliced per shard) the confusion matrix equals
    the single-device result exactly — multi-chip native-resolution eval."""
    from iv2019_tpu.parallel.mesh import create_mesh, replicate, shard_batch

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest sets XLA_FLAGS)")

    settings, model, variables = tiny_eval
    s = settings.replace(
        mode="eval", sliding_window=True, eval_size=(64, 128),
        window_blend="gaussian",
    )
    fn = make_eval_step(s, model=model, tcids2ecids=list(range(19)) + [-1])
    rng = np.random.RandomState(10)
    images = rng.uniform(-1, 1, (8, 64, 128, 3)).astype(np.float32)
    labels = rng.randint(0, 20, (8, 64, 128)).astype(np.int32)

    single = fn(
        variables["params"], variables["batch_stats"],
        jnp.asarray(images), jnp.asarray(labels),
    )

    mesh = create_mesh(8)
    v = replicate(variables, mesh)
    sharded = shard_batch({"im": images, "la": labels}, mesh)
    meshed = fn(v["params"], v["batch_stats"], sharded["im"], sharded["la"])
    np.testing.assert_array_equal(np.asarray(single), np.asarray(meshed))
    assert int(np.asarray(meshed).sum()) == 8 * 64 * 128


def test_export_sliding_window_program(tiny_eval, tmp_path):
    """The sliding-window predict program is one static-shape XLA module, so
    it exports to StableHLO and serves through the C++ PJRT loader: input is
    the native eval_size frame, outputs are decisions + l1 probabilities."""
    from iv2019_tpu.tools.export_model import export_stablehlo
    from iv2019_tpu.train.step import make_predict_step

    settings, model, variables = tiny_eval
    s = settings.replace(mode="predict", sliding_window=True, eval_size=(64, 128))
    step = make_predict_step(s, model=model)
    inner = step.__wrapped__ if hasattr(step, "__wrapped__") else step
    paths = export_stablehlo(
        model, variables, (1, 64, 128, 3), str(tmp_path),
        predict_fn=lambda im: inner(
            variables["params"], variables["batch_stats"], im
        ),
    )
    text = open(paths["stablehlo"]).read()
    assert "tensor<1x64x128x3xf32>" in text  # native-size input signature
    assert "stablehlo.while" in text  # the window scan compiled in


def test_window_eval_bounds_activation_memory():
    """The point of windowing at megapixel sizes: activation (temp) memory
    stays bounded by the window size instead of scaling with the full image
    area. AOT-only (XLA memory analysis, no execution) on the full model."""
    from iv2019_tpu.config import Settings
    from iv2019_tpu.models.model import build_model
    from iv2019_tpu.train.step import make_eval_step

    base = Settings(
        mode="eval", Nb=1,
        height_feature_extractor=128, width_feature_extractor=256,
        Ntrain=256, Ne=3, learning_rate_boundaries=(1, 2),
        learning_rate_values=(0.01, 0.005, 0.0025),
        compute_dtype="bfloat16",
    ).finalize()
    model = build_model(base)
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3), jnp.float32)
        )
    )
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    t2e = list(range(19)) + [-1]

    def temp_bytes(fn, images, labels):
        inner = fn.__wrapped__ if hasattr(fn, "__wrapped__") else fn
        compiled = jax.jit(inner).lower(
            variables["params"], variables["batch_stats"], images, labels
        ).compile()
        return compiled.memory_analysis().temp_size_in_bytes

    H, W = 512, 1024
    images = jnp.zeros((1, H, W, 3), jnp.float32)
    labels = jnp.zeros((1, H, W), jnp.int32)
    native = temp_bytes(make_eval_step(base, model=model, tcids2ecids=t2e),
                        images, labels)
    s_win = base.replace(sliding_window=True, eval_size=(H, W),
                         window_overlap=0.0)
    windowed = temp_bytes(make_eval_step(s_win, model=model, tcids2ecids=t2e),
                          images, labels)
    # measured 0.156 vs 0.323 GB (2.1x) at this size; the gap widens with
    # image area (docs/PERFORMANCE.md window-eval memory table)
    assert windowed < 0.7 * native, (windowed, native)


def test_synthetic_eval_batches_honor_eval_size():
    from iv2019_tpu.input.cityscapes import synthetic_eval_batches
    from iv2019_tpu.problem.problem_def import load_problem_def

    s = tiny_settings(eval_size=(64, 128), Nb=2)
    pd = load_problem_def(
        "iv2019_tpu/problem_definitions/cityscapes/problem01.json"
    )
    batch = next(iter(synthetic_eval_batches(s, pd)))
    assert batch["proimages"].shape == (2, 64, 128, 3)
    assert batch["prolabels"].shape == (2, 64, 128)
