"""Template-length statistics: model math and learning (reference:
TemplateLengthStatistics.cpp semantics)."""

import numpy as np

from isaac_aligner_tpu.align import tls


def test_alignment_model_encoding():
    # FRp: f1 forward, f2 reverse, f1 <= f2  (the standard Illumina model)
    assert tls.alignment_model(100, False, 300, True) == tls.FRp
    # RFm: f1 reverse, f2 forward, f1 > f2
    assert tls.alignment_model(300, True, 100, False) == tls.RFm
    assert tls.alignment_model(100, False, 100, False) == tls.FFp
    assert tls.alignment_model(200, True, 100, True) == tls.RRm


def test_template_length():
    # f1 at 100 len 50, f2 at 300 len 100 -> 300+100-100 = 300
    assert tls.template_length(100, 50, 300, 100) == 300
    # overlapping/contained: max with observed length
    # f1=100 < f2=120: span = 120+50-100 = 70, max(70, 250) = 250
    assert tls.template_length(100, 250, 120, 50) == 250


def test_learner_converges_on_synthetic_pairs():
    rng = np.random.default_rng(0)
    learner = tls.TemplateLengthLearner()
    n = 30000
    # FRp pairs with insert ~ N(400, 30): r1 fwd at p, r2 rev at p+tlen-100
    p = rng.integers(0, 10_000_000, n)
    tlen = rng.normal(400, 30, n).astype(np.int64).clip(150, 1000)
    f1_pos = p
    f2_pos = p + tlen - 100
    stable = learner.add_batch(f1_pos, np.zeros(n, bool), 100,
                               f2_pos, np.ones(n, bool), 100,
                               np.ones(n, bool))
    stats = learner.finalize()
    assert stats.best_models[0] == tls.FRp
    assert 380 <= stats.median <= 420
    assert stats.min >= 250 and stats.max <= 550
    assert 20 <= stats.low_std_dev <= 45
    assert stable or stats.stable


def test_match_and_nominal():
    s = tls.TemplateLengthStatistics(min=300, max=500, median=400,
                                     best_models=(tls.FRp, tls.RFm))
    s.mate_min, s.mate_max = 300, 500
    model = tls.alignment_model(1000, False, 1300, True)
    length = tls.template_length(1000, 100, 1300, 100)
    assert s.nominal(model, length)
    # oversized
    length2 = tls.template_length(1000, 100, 1900, 100)
    assert not s.nominal(model, length2)
    assert s.match_model(model, length2)  # loose filter still passes


def test_mate_window_frp():
    s = tls.TemplateLengthStatistics(min=300, max=500, median=400,
                                     best_models=(tls.FRp, tls.RFm))
    s.mate_min, s.mate_max = 300, 500
    # read 0 forward at position P: mate (read 1, reverse) leftmost position
    # in [P + min - L2, P + max - L2]
    lo = s.mate_min_position(0, False, 1000, (100, 100))
    hi = s.mate_max_position(0, False, 1000, (100, 100))
    assert (lo, hi) == (1000 + 300 - 100, 1000 + 500 - 100)
    assert s.mate_orientation(0, False) is True  # mate is reverse
    # read 0 reverse at P: it is the rightmost; mate in [P - max + L1, P - min + L1]
    lo2 = s.mate_max_position(0, True, 1000, (100, 100))
    hi2 = s.mate_min_position(0, True, 1000, (100, 100))
    assert lo2 == 1000 - 300 + 100
    assert hi2 == 1000 - 500 + 100
    assert s.mate_orientation(0, True) is False
