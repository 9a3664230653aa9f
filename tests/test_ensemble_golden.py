"""Acceptance gate over the committed ensemble-equivalence study.

The BASELINE north star (pointwise dense-flow MSE) is formally replaced by
an ensemble criterion — see ``docs/parity_matrix.md`` §"Ensemble statistical
equivalence": both implementations (this repo and the reference,
``src/solver/generative_max_likelihood.py:459-529`` +
``patch_eklt_pyramid2.py:134-191``) run the full 770-iteration hot_plate1
schedule over synthetic scenes × init seeds, and the per-run EPE-vs-truth
distributions must be statistically indistinguishable.

These tests pin the *committed* study (``tests/goldens/ensemble_parity.json``,
produced by ``tools/ensemble_parity.py`` — ~19 h of paired compute) to the
acceptance criterion, per physics regime:

  * ``bench``  — the benchmark-like plume (44 paired runs);
  * ``slow``   — small-signal regime (max_displacement 1.5, slow plume);
  * ``strong`` — large-warp regime (max_displacement 6.0 — twice bench;
    exercises |shift| > 1 where the sign-select stencil warp's exactness
    bound no longer applies);
  * ``sparse`` — 4x fewer events per frame (noisier increments).

Acceptance (per regime): mean paired EPE difference within ±0.02 px and no
rejection of distribution equality at α = 0.05 (Welch t + Mann-Whitney U).
"""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "ensemble_parity.json")

EXPECTED_N = {"bench": 44, "slow": 10, "strong": 10, "sparse": 10}
MEAN_DIFF_TOL_PX = 0.02
ALPHA = 0.05


def _runs_by_variant():
    with open(GOLDEN) as f:
        state = json.load(f)
    complete = [r for r in state["runs"].values()
                if "ref_epe" in r and "my_epe" in r]
    out = {}
    for r in complete:
        out.setdefault(r.get("variant", "") or "bench", []).append(r)
    return out


@pytest.mark.parametrize("variant", sorted(EXPECTED_N))
def test_variant_meets_equivalence_acceptance(variant):
    from scipy import stats

    runs = _runs_by_variant().get(variant, [])
    assert len(runs) >= EXPECTED_N[variant], (
        f"{variant}: study incomplete ({len(runs)}/{EXPECTED_N[variant]} "
        "paired runs committed)")
    mine = np.array([r["my_epe"] for r in runs])
    ref = np.array([r["ref_epe"] for r in runs])
    diff = mine - ref
    assert abs(diff.mean()) <= MEAN_DIFF_TOL_PX, (
        f"{variant}: paired EPE diff {diff.mean():+.4f} px exceeds "
        f"±{MEAN_DIFF_TOL_PX}")
    _, p_welch = stats.ttest_ind(mine, ref, equal_var=False)
    _, p_mw = stats.mannwhitneyu(mine, ref, alternative="two-sided")
    assert p_welch > ALPHA, f"{variant}: Welch rejects equality (p={p_welch:.4f})"
    assert p_mw > ALPHA, f"{variant}: Mann-Whitney rejects equality (p={p_mw:.4f})"


def test_summary_consistent_with_runs():
    """The committed summary block is recomputed from the committed runs
    (ADVICE r3: a mid-batch commit once left them inconsistent)."""
    with open(GOLDEN) as f:
        state = json.load(f)
    complete = [r for r in state["runs"].values()
                if "ref_epe" in r and "my_epe" in r]
    s = state["summary"]
    assert s["n_runs"] == len(complete)
    mine = np.array([r["my_epe"] for r in complete])
    ref = np.array([r["ref_epe"] for r in complete])
    assert np.isclose(s["my_epe_mean"], mine.mean(), rtol=1e-9)
    assert np.isclose(s["ref_epe_mean"], ref.mean(), rtol=1e-9)
    assert np.isclose(s["paired_diff_mean"], (mine - ref).mean(), rtol=1e-9,
                      atol=1e-12)
    by_v = s["by_variant"]
    for v, expected in EXPECTED_N.items():
        key = "base" if v == "bench" else v
        assert by_v[key]["n"] >= expected


RECIPE_GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                             "recipe_parity.json")
RECIPE_EXPECTED_CHAINS = 6   # scenes {0,1,2} × init keys {0,1} per regime


@pytest.mark.parametrize("variant", ["bench", "slow", "strong", "sparse"])
def test_recipe_not_worse_than_parity_per_regime(variant):
    """Production-recipe certification across regimes (VERDICT r4 #3).

    ``tools/ensemble_parity.py --recipe`` runs self-paired sequences on the
    TPU: a parity chain (every frame cold at n_iter 600, full-frame
    objective — the configuration the reference-paired ensemble certified)
    vs the recipe chain (``restrict_to_roi`` + ``warm_start`` +
    ``steady_n_iter: 300``, ``docs/performance.md`` §production recipe).
    Acceptance is ONE-SIDED: per regime the mean paired steady-frame EPE
    difference (recipe − parity) must not exceed +0.02 px.  Where the two
    distributions are distinguishable at α = 0.05 the direction must favor
    the recipe — the committed study found exactly that in the slow and
    sparse regimes (−0.042 / −0.022 px: warm-started chains beat
    independent cold solves where the signal is weak or noisy), which is a
    win to keep, not drift to reject.
    """
    from scipy import stats

    with open(RECIPE_GOLDEN) as f:
        state = json.load(f)
    chains = [c for c in state["runs"].values()
              if c["variant"] == variant
              and "parity_epe" in c and "recipe_epe" in c]
    assert len(chains) >= RECIPE_EXPECTED_CHAINS, (
        f"{variant}: recipe study incomplete ({len(chains)} chains)")
    start = state["summary"]["steady_from_frame"]
    par = np.concatenate([c["parity_epe"][start:] for c in chains])
    rec = np.concatenate([c["recipe_epe"][start:] for c in chains])
    diff = rec - par
    assert diff.mean() <= MEAN_DIFF_TOL_PX, (
        f"{variant}: recipe worse than parity by {diff.mean():+.4f} px "
        f"(> +{MEAN_DIFF_TOL_PX})")
    _, p_welch = stats.ttest_ind(rec, par, equal_var=False)
    if p_welch <= ALPHA:
        assert diff.mean() < 0, (
            f"{variant}: distributions differ (p={p_welch:.4g}) in the "
            "unfavorable direction")


def test_recipe_summary_consistent_with_chains():
    """The committed recipe summary block is recomputed from the committed
    chains (same consistency contract as the ensemble golden)."""
    with open(RECIPE_GOLDEN) as f:
        state = json.load(f)
    start = state["summary"]["steady_from_frame"]
    for v, s in state["summary"]["by_variant"].items():
        chains = [c for c in state["runs"].values()
                  if c["variant"] == v
                  and "parity_epe" in c and "recipe_epe" in c]
        par = np.concatenate([c["parity_epe"][start:] for c in chains])
        rec = np.concatenate([c["recipe_epe"][start:] for c in chains])
        assert s["n_chains"] == len(chains)
        assert s["n_steady_frames"] == par.size
        assert np.isclose(s["parity_epe_mean"], par.mean(), rtol=1e-9)
        assert np.isclose(s["recipe_epe_mean"], rec.mean(), rtol=1e-9)
        assert np.isclose(s["paired_diff_mean"], (rec - par).mean(),
                          rtol=1e-9, atol=1e-12)


def test_every_run_records_pair_diagnostics():
    """Each paired run carries the trajectory-divergence diagnostics the
    docs cite (pairwise flow MSE/corr between the two implementations)."""
    for variant, runs in _runs_by_variant().items():
        for r in runs:
            assert {"pair_mse", "pair_corr", "my_dt_s", "ref_dt_s"} <= set(r), (
                f"{variant}: incomplete run record {sorted(r)}")
            assert 0.5 < r["pair_corr"] <= 1.0
