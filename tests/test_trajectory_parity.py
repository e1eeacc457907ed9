"""Multi-step training-dynamics parity vs the reference torch trainer
(tools/parity_trajectory.py): identical init (through the converter),
identical data, 4 full G+D iterations on CPU; every loss term must track the
reference's trajectory. This is the compounded-dynamics check the one-step
parity tests can't provide (TTUR Adam, hinge G<->D coupling, train-mode BN).

Tolerances: step 0 is near-exact (measured 1e-6 rel on every term); later
steps widen because the objective is genuinely chaotic — the warp softmax at
temperature 0.01 is argmax-like, so a 1e-4 logit difference can flip a
correspondence and step the 100-weighted mask NLL discontinuously. The 50-step run (tools/parity_trajectory.py --steps 50) is a
manual artifact (PARITY_TRAJECTORY.json) rather than a CI test.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.filterwarnings("ignore")


def test_four_step_loss_trajectory_matches_torch():
    from tools.parity_trajectory import run_parity

    torch_curves, our_curves = run_parity(steps=4)
    assert set(torch_curves) == set(our_curves), (
        sorted(torch_curves), sorted(our_curves))
    # step-wise relative tolerance: tight at step 0 (pure loss parity),
    # growing with compounded-update drift
    tols = [2e-3, 2e-2, 5e-2, 2e-1]
    for k, tv in torch_curves.items():
        ov = our_curves[k]
        for s, (t, o) in enumerate(zip(tv, ov)):
            rel = abs(o - t) / (abs(t) + 1e-2)
            assert rel < tols[s], (
                f"{k} diverged at step {s}: torch={t:.5f} ours={o:.5f} "
                f"rel={rel:.4f} (tol {tols[s]})\n"
                f"torch curve: {np.round(tv, 5).tolist()}\n"
                f"our curve:   {np.round(ov, 5).tolist()}")
