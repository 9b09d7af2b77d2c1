"""Window-size cost model + autotune cache plumbing (utils/window.py) —
analogue of the reference's window_size_optimizer.rs cost-model tests."""

from tpu_msm.config import MSMConfig, default_config
from tpu_msm.constants import BN254_S12
from tpu_msm.utils import window


def test_predicted_optimum_grows_with_n():
    opts = [window.optimal_window_size(1 << lg) for lg in (10, 14, 18, 22, 26)]
    assert opts == sorted(opts)
    assert 4 <= opts[0] <= opts[-1] <= 16


def test_cost_model_matches_pippenger_shape():
    # cost at the optimum beats both extremes
    n = 1 << 20
    best = window.optimal_window_size(n)
    assert window.predict_cost(n, best) < window.predict_cost(n, 4)
    assert window.predict_cost(n, best) <= window.predict_cost(n, 16)


def test_candidate_configs_valid():
    for cfg in window.candidate_configs(1 << 16):
        assert isinstance(cfg, MSMConfig)
        assert cfg.columns <= (1 << 16)


def test_default_config_schedule_monotone_windows():
    sizes = [1 << 9, 1 << 12, 1 << 16, 1 << 20, 1 << 24]
    ws = [default_config(n).window_size for n in sizes]
    assert ws == sorted(ws)
