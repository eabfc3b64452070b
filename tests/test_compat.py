"""Reference-API compatibility: the train() signature from train_and_test.py."""

import numpy as np

from feature_level_style_transfer_for_tsc_tpu.compat import train
from feature_level_style_transfer_for_tsc_tpu.config import FlowConfig, PipelineConfig
from feature_level_style_transfer_for_tsc_tpu.data.synthetic import make_dataset


def test_reference_train_signature(tmp_path):
    td, sd = {}, {}
    t_train = make_dataset(8, 2, 16, 2, seed=0, label_dict=td)
    t_test = make_dataset(6, 2, 16, 2, seed=1, label_dict=td, is_train=False)
    s_train = make_dataset(8, 1, 12, 3, seed=2, label_dict=sd)
    s_test = make_dataset(6, 1, 12, 3, seed=3, label_dict=sd, is_train=False)
    cfg = PipelineConfig(
        batch_size=4, max_kernel_size=5, cdan_dim=32, cpc_hidden=8,
        budget_multiplier=0.02, flow=FlowConfig(n_flows=2, wn_channels=8, wn_layers=2),
    )
    state, history = train(
        t_train, t_test, s_train, s_test, True, 2,  # positional, like main.py:11
        config=cfg,
        epochs={"p1": 1, "p2": 1, "p3": 1, "p4": 1, "p5": 2},
        verbose=False,
        log_file=str(tmp_path / "log.jsonl"),
    )
    assert any(h["phase"] == "p5" for h in history)
    assert (tmp_path / "log.jsonl").exists()
    for h in history:
        for k, v in h.items():
            if isinstance(v, float):
                assert np.isfinite(v)
