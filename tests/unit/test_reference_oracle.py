"""Composed-pipeline parity against the reference's OWN runnable code.

VERDICT r2 item #1: the strongest parity evidence obtainable without the
real CARS corpus is to execute the reference's actual torch/cv2 pipeline
(/root/reference/src/data/quality_preprocessing.py — QualityAwarePreprocessor
.preprocess_image:194-228, .validate_preprocessing:172-192,
AdaptiveNormalization:282-339) and diff the on-device composed pipeline
(`ops/quality.quality_preprocess[_and_normalize]`) against it per image,
per branch, per guard path.

The reference module is loaded by file path (it only imports numpy/cv2/
torch/rich at module level). Every image in the battery is constructed to
pin ONE specific branch combination:

    clean          no issue            → pass-through
    extreme_dark   mean<150            → gamma 0.8 + CLAHE(2.0, 16×16)
    low_contrast   std<80              → CLAHE(0.03, 32×32)
    artifacts      max/mean>30         → clip p99.9 + median (+bilateral)
    artifact_dim   artifacts, dim bg   → suppression → too-dark guard blend
    dark_artifact  dark + artifacts    → both branches + too-dark guard
    flat           constant (dark)     → CLAHE flat-image identity

Documented deviations asserted explicitly where they apply:
- Thresholds run on the uint16 scale (docs/DESIGN.md "Known deviations"):
  the reference's *batched* forward() normalises before thresholding and
  misclassifies everything as extreme-dark; its per-image path
  (preprocess_image, used here) implements the intended semantics, which
  is exactly what we built — so the per-image oracle must AGREE with us
  while forward() must not (test_batched_forward_deviation).
"""
import importlib.util
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from thyroid_tpu.ops import quality_issue_masks, quality_preprocess
from thyroid_tpu.ops.quality import (
    QualityParams,
    quality_preprocess_and_normalize,
)

REF_PATH = Path("/root/reference/src/data/quality_preprocessing.py")

pytestmark = pytest.mark.skipif(
    not REF_PATH.exists(), reason="reference checkout not available")


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_quality", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_reference()


def _battery(size: int) -> dict[str, np.ndarray]:
    """Branch-pinning uint16 images (values keep safe margins from every
    threshold so f32-vs-f64 statistics cannot flip a branch)."""
    rs = np.random.RandomState(1234 + size)
    imgs: dict[str, np.ndarray] = {}
    # clean: mean≈8000, std≈3400, max/mean≈1.8
    imgs["clean"] = rs.randint(2000, 14000, (size, size)).astype(np.uint16)
    # extreme_dark: mean≈120 (<150), ratio≈1.2
    imgs["extreme_dark"] = rs.randint(100, 140, (size, size)).astype(np.uint16)
    # low_contrast: mean≈5000, std≈29 (<80)
    imgs["low_contrast"] = (
        5000 + rs.randint(-50, 50, (size, size))).astype(np.uint16)
    # artifacts: bright sparse spikes over a mid background;
    # spikes < 0.1% of pixels so the p99.9 clip lands in the background
    art = rs.randint(1000, 3000, (size, size)).astype(np.uint16)
    n_spk = (size * size) // 2000  # 0.05%
    ys, xs = rs.randint(0, size, n_spk), rs.randint(0, size, n_spk)
    art[ys, xs] = 65000
    imgs["artifacts"] = art
    # artifact_dim: dim background (<256 → 8-bit floor 0) + spikes pushes
    # the suppressed mean below 0.1× original → too-dark guard blend.
    # Spike mass lifts the mean just over 150 so extreme_dark stays off.
    dim = rs.randint(80, 140, (size, size)).astype(np.uint16)
    n_spk = max(1, (size * size) // 1000)
    ys, xs = rs.randint(0, size, n_spk), rs.randint(0, size, n_spk)
    dim[ys, xs] = 60000
    imgs["artifact_dim"] = dim
    # dark_artifact: dark AND artifacts; suppression zeroes the frame,
    # gamma/CLAHE see a flat image, guard blends back
    da = rs.randint(60, 100, (size, size)).astype(np.uint16)
    n_spk = max(1, (size * size) // 4000)
    ys, xs = rs.randint(0, size, n_spk), rs.randint(0, size, n_spk)
    da[ys, xs] = 30000
    imgs["dark_artifact"] = da
    # flat: constant, classified extreme_dark; CLAHE must hit its
    # flat-image identity guard on both sides
    imgs["flat"] = np.full((size, size), 140, dtype=np.uint16)
    return imgs


EXPECTED_ISSUES = {
    "clean": set(),
    "extreme_dark": {"extreme_dark"},
    "low_contrast": {"low_contrast"},
    "artifacts": {"artifacts"},
    "artifact_dim": {"artifacts"},
    "dark_artifact": {"extreme_dark", "artifacts"},
    "flat": {"extreme_dark"},
}


def _run_ours(batch_u16: np.ndarray) -> np.ndarray:
    x = jnp.asarray(batch_u16.astype(np.float32))[..., None]
    out = quality_preprocess(x, QualityParams())
    return np.asarray(out)[..., 0]


@pytest.mark.unit
@pytest.mark.parametrize("size", [512, 448])
class TestComposedPipelineOracle:
    """quality_preprocess vs QualityAwarePreprocessor.preprocess_image."""

    def test_branch_detection_matches_reference(self, ref, size):
        pre = ref.QualityAwarePreprocessor()
        imgs = _battery(size)
        batch = np.stack(list(imgs.values())).astype(np.float32)[..., None]
        masks = quality_issue_masks(jnp.asarray(batch))
        for i, (name, img) in enumerate(imgs.items()):
            ref_issues = set(pre.identify_quality_issues(img))
            assert ref_issues == EXPECTED_ISSUES[name], (
                f"{name}@{size}: battery no longer pins the intended "
                f"branch (got {ref_issues})")
            ours = {k for k in ("extreme_dark", "low_contrast", "artifacts")
                    if bool(masks[k][i])}
            assert ours == ref_issues, f"{name}@{size}: {ours} != {ref_issues}"

    def test_composed_output_matches_reference(self, ref, size):
        pre = ref.QualityAwarePreprocessor()
        imgs = _battery(size)
        batch = np.stack(list(imgs.values()))
        got = _run_ours(batch)
        for i, (name, img) in enumerate(imgs.items()):
            want = pre.preprocess_image(img).astype(np.float64)
            diff = np.abs(got[i].astype(np.float64) - want)
            # ±1 grey level on the uint16 scale for the gamma/CLAHE/guard
            # branches. The artifact branch passes through an 8-bit
            # round-trip whose clip value comes from np.percentile
            # (reference) vs value-space bisection (ours, resolution
            # <0.02): a clip value within 0.02 of an exact 256-multiple
            # can floor to adjacent 8-bit levels, so allow one 8-bit
            # level (=256) on a vanishing pixel fraction there.
            tol = 1.0
            frac_tol = 0.0
            if "artifact" in name:
                tol = 256.0
                frac_tol = 1e-4
            frac_over = float((diff > tol).mean())
            assert frac_over <= frac_tol, (
                f"{name}@{size}: {frac_over:.2e} of pixels differ by >"
                f"{tol} (max {diff.max():.1f})")
            assert float(np.median(diff)) <= 1.0, (
                f"{name}@{size}: median diff {np.median(diff)}")

    def test_guard_paths_exercised(self, ref, size):
        """The battery must actually drive validate_preprocessing's blend
        (reference :172-192) — otherwise the composed test proves nothing
        about the guard."""
        pre = ref.QualityAwarePreprocessor()
        imgs = _battery(size)
        guard_hits = 0
        for name in ("artifact_dim", "dark_artifact"):
            img = imgs[name]
            issues = pre.identify_quality_issues(img)
            # reproduce preprocess_image WITHOUT the guard
            processed = img.copy()
            if "artifacts" in issues:
                processed = pre.suppress_artifacts(
                    processed, pre.params["artifacts"]["percentile_clip"])
            if "extreme_dark" in issues:
                processed = pre.apply_gamma_correction(
                    processed, pre.params["extreme_dark"]["gamma"])
                processed = pre.apply_clahe(
                    processed, pre.params["extreme_dark"]["clahe_clip_limit"],
                    pre.params["extreme_dark"]["clahe_grid_size"])
            elif "low_contrast" in issues:
                processed = pre.apply_clahe(
                    processed, pre.params["low_contrast"]["clahe_clip_limit"],
                    pre.params["low_contrast"]["clahe_grid_size"])
            guarded = pre.validate_preprocessing(img, processed)
            if not np.array_equal(guarded, processed):
                guard_hits += 1
        assert guard_hits >= 1, "battery never triggers the blend guard"


@pytest.mark.unit
def test_validate_preprocessing_guard_pinning(ref):
    """Unit-pin the over-correction guard against the reference function on
    explicit (original, processed) pairs for all three paths (too-bright
    blend 0.5, too-dark blend 0.3, untouched)."""
    pre = ref.QualityAwarePreprocessor()
    rs = np.random.RandomState(7)
    orig = rs.randint(500, 1500, (64, 64)).astype(np.uint16)  # mean ≈ 1000
    cases = {
        "too_bright": (orig.astype(np.float64) * 12).clip(0, 65535)
        .astype(np.uint16),
        "too_dark": (orig.astype(np.float64) * 0.05).astype(np.uint16),
        "untouched": (orig.astype(np.float64) * 2).astype(np.uint16),
    }
    for name, proc in cases.items():
        want = pre.validate_preprocessing(orig, proc).astype(np.float64)
        o = orig.astype(np.float64)
        p = proc.astype(np.float64)
        if name == "too_bright":
            ours = np.floor(o * 0.5 + p * 0.5)
        elif name == "too_dark":
            ours = np.floor(o * 0.7 + p * 0.3)
        else:
            ours = p
        assert np.array_equal(ours, want), name


@pytest.mark.unit
@pytest.mark.parametrize("method", ["percentile", "minmax"])
def test_adaptive_normalization_oracle(ref, method):
    """quality_preprocess_and_normalize vs the reference's
    AdaptiveNormalization (torch.quantile / minmax, :298-339) applied to
    the reference's own preprocessed output."""
    torch = pytest.importorskip("torch")
    pre = ref.QualityAwarePreprocessor()
    imgs = _battery(512)
    batch = np.stack(list(imgs.values()))
    ref_proc = np.stack(
        [pre.preprocess_image(img) for img in batch.astype(np.uint16)])
    norm = ref.AdaptiveNormalization(method=method)
    want = norm(
        torch.from_numpy(ref_proc.astype(np.float32))[:, None]
    ).numpy()[:, 0]
    x = jnp.asarray(batch.astype(np.float32))[..., None]
    got = np.asarray(quality_preprocess_and_normalize(
        x, QualityParams(), normalize_method=method))[..., 0]
    # outputs are in [0,1]. The composed-pipeline tolerance (±1 grey
    # level; one 8-bit level on a ≤1e-4 fraction of the artifact branch)
    # propagates through PER-IMAGE normalisation: a narrow-span frame
    # (CLAHE'd low-contrast span ≈ 99, guard-blended dim frames span
    # 27-41) amplifies one grey level to ~1/span of the normalised range.
    # So the bound is span-relative: ≤2.5 grey levels per pixel with a
    # ≤2e-4 tail for the artifact branch's 8-bit clip boundary (measured:
    # max diff × span = 1.0 grey level on every battery image).
    for i, (name, _) in enumerate(imgs.items()):
        if method == "percentile":
            lo, hi = np.percentile(ref_proc[i], [1, 99])
        else:
            lo, hi = ref_proc[i].min(), ref_proc[i].max()
        span = float(hi - lo) + 1e-8
        diff = np.abs(got[i] - want[i])
        tol = max(2.5 / span, 1.5 / 255.0)
        assert float((diff > tol).mean()) <= 2e-4, (
            f"{method}/{name}: frac>{tol:.4f} = {(diff > tol).mean():.2e}, "
            f"max {diff.max():.4f} (span {span:.1f})")
        assert float(np.median(diff)) <= 1.0 / 255.0


@pytest.mark.unit
def test_batched_forward_deviation(ref):
    """DOCUMENTED DEVIATION (docs/DESIGN.md): the reference's batched
    forward() normalises to [0,1] *upstream* (dataset /65535) while its
    thresholds assume raw uint16 values, so every [0,1] image classifies
    as extreme_dark (mean<150). We deliberately do NOT reproduce that:
    our pipeline runs on the uint16 scale where the thresholds mean what
    the authors intended. Pin the defect so the deviation stays honest."""
    pre = ref.QualityAwarePreprocessor()
    clean01 = _battery(512)["clean"].astype(np.float64) / 65535.0
    assert pre.identify_quality_issues(clean01) == ["extreme_dark"]
    # same image on the uint16 scale — both agree it is clean
    assert pre.identify_quality_issues(_battery(512)["clean"]) == []
    masks = quality_issue_masks(
        jnp.asarray(_battery(512)["clean"].astype(np.float32))[None, ..., None])
    assert not bool(masks["extreme_dark"][0])
