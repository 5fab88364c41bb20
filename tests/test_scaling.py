"""Scaling-efficiency report sanity (SURVEY.md N20)."""
from modulationdetectioncnn_tpu.config import AmcConfig
from modulationdetectioncnn_tpu.eval import scaling


def test_stream_efficiency_monotone_in_block():
    link = scaling.LinkModel(scaling.DCN_BW, scaling.DCN_LAT, "dcn")
    effs = [
        scaling.stream_efficiency(1e9, b, 120, link)
        for b in (1 << 15, 1 << 20, 1 << 22)
    ]
    assert effs == sorted(effs)
    assert 0 < effs[0] < 1
    # production blocks amortize DCN latency past the 85% gate
    assert effs[-1] > 0.85


def test_scaling_report_fields():
    r = scaling.scaling_report(AmcConfig(), measured_chip_rate=3.5e8)
    assert r["measured_1chip_samples_per_sec"] == 3.5e8
    assert "assumptions" in r and r["assumptions"]["halo_samples"] == 112
    proj = r["projected"]
    big = [v for k, v in proj.items()
           if k.startswith("stream_eff_2chip_ici_block_41943")]
    assert big and big[0] > 0.99
    assert proj["train_dp_eff_2host_dcn"] > 0.5


def test_default_policy_meets_2host_dcn_target():
    """The DEFAULT config must satisfy the >=85% 2-host scaling target
    under the repo's own projection (VERDICT r3 missing #4): the DCN
    block-size floor (pipeline.effective_block_len) is what makes it."""
    from modulationdetectioncnn_tpu.dsp.pipeline import effective_block_len

    cfg = AmcConfig()
    assert effective_block_len(cfg.stream, 1) == cfg.stream.block_len
    r = scaling.scaling_report(cfg, measured_chip_rate=4.3e8)
    assert r["projected"]["stream_eff_2host_dcn_at_default_policy"] >= 0.85


def test_train_dp_efficiency_model():
    link = scaling.LinkModel(scaling.ICI_BW, scaling.ICI_LAT, "ici")
    e2 = scaling.train_dp_efficiency(2e-3, 1.08e7, 2, link)
    e8 = scaling.train_dp_efficiency(2e-3, 1.08e7, 8, link)
    assert 0.8 < e8 < e2 < 1.0
