"""Bench harness contract smoke (SURVEY.md §4b "benchmark harness as a
test"): the driver consumes ONE stdout JSON line with fixed fields; run the
harness machinery on the CPU test platform with a tiny config and assert
the contract — catches field renames / fallback-logic breakage without
needing the chip (real throughput is recorded by the driver's own run)."""
import json

from modulationdetectioncnn_tpu.config import AmcConfig, apply_overrides


def test_bench_run_contract_fields(capsys):
    import bench as bench_mod

    cfg = apply_overrides(AmcConfig(), [
        "bench.batch_size=64", "bench.warmup_iters=1", "bench.timed_iters=3",
        "bench.backend=xla_bf16", "bench.stream_extra=false",
    ])
    res = bench_mod.run(cfg)
    assert res["metric"] == "classified_iq_samples_per_sec_per_chip"
    assert res["unit"] == "samples/s"
    assert res["value"] > 0
    assert res["fallback"] is False
    assert abs(res["vs_baseline"] - res["value"] / 1e9) < 5e-5  # rounded to 4 dp
    out = capsys.readouterr().out.strip().splitlines()
    parsed = json.loads(out[-1])
    assert parsed["metric"] == res["metric"]


def test_bench_calibration_headlines_the_fastest_kernel(monkeypatch, capsys):
    """Per-session kernel calibration (VERDICT r4 next #7): every candidate
    gets the full median measurement, the winner becomes the headline
    backend, and its own measurement is reused (no re-measure)."""
    import bench as bench_mod

    cands = AmcConfig().bench.calibration_candidates
    assert "pallas_int8_v7" in cands and len(cands) > 1
    # fastest candidate is NOT the default backend, so the test proves the
    # winner actually switches
    rates = {c: (3.0e6 if c == "pallas_int8_v10" else 2.0e6 - 1e5 * i)
             for i, c in enumerate(cands)}
    measured_backends = []

    def fake_make(cfg, backend, batch):
        return backend, (None,)

    def fake_measure(fwd, args, bc, frame_len):
        measured_backends.append(fwd)
        fps = rates[fwd]
        return fps, fps * frame_len, {
            "samples_per_sec_min": round(fps * frame_len),
            "timing_samples_us": [round(1e6 * bc.batch_size / fps, 1)] * 5,
        }

    monkeypatch.setattr(bench_mod, "make_classifier", fake_make)
    monkeypatch.setattr(bench_mod, "_measure", fake_measure)
    cfg = apply_overrides(AmcConfig(), ["bench.stream_extra=false"])
    res = bench_mod.run(cfg, quiet=True)
    assert res["backend"] == "pallas_int8_v10"  # fastest candidate wins
    assert res["fallback"] is False
    # one full measurement per candidate, none repeated for the winner
    assert sorted(measured_backends) == sorted(rates)


def test_stream_bench_contract_fields():
    import bench as bench_mod

    cfg = apply_overrides(AmcConfig(), [
        "bench.batch_size=32", "bench.warmup_iters=1", "bench.timed_iters=3",
        "bench.backend=xla_bf16", "bench.mode=stream",
        "stream.num_subbands=4", "stream.taps_per_branch=4",
    ])
    res = bench_mod.run(cfg, quiet=True)
    assert res["metric"] == "streamed_iq_samples_per_sec_per_chip"
    assert res["value"] > 0 and res["fallback"] is False
