"""tuning.json contract: conservative defaults when absent, measured
values when present, env override at import (tda_eeg_audio_tpu/tuning.py);
plus the battery's promotion gates (scratch/write_tuning.py)."""
import importlib
import json
import sys
from pathlib import Path

import tda_eeg_audio_tpu.tuning as tuning

SCRATCH = Path(__file__).resolve().parents[1] / "scratch"


def test_defaults_when_absent(monkeypatch, tmp_path):
    monkeypatch.setattr(tuning, "_PATH", tmp_path / "tuning.json")
    d = tuning._load()
    assert d["eeg_bank"] is False and d["eeg_batch"] == 16


def test_file_merges_over_defaults(monkeypatch, tmp_path):
    p = tmp_path / "tuning.json"
    # unknown keys (e.g. the deleted round-4 kernel knobs) are ignored
    p.write_text(json.dumps(dict(pallas_min_n=80, audio_chains=4)))
    monkeypatch.setattr(tuning, "_PATH", p)
    d = tuning._load()
    assert d["pallas_min_n"] == 80
    assert "audio_chains" not in d
    assert d["eeg_batch"] == 16            # unspecified keys keep defaults


def test_corrupt_file_falls_back(monkeypatch, tmp_path):
    p = tmp_path / "tuning.json"
    p.write_text("{not json")
    monkeypatch.setattr(tuning, "_PATH", p)
    assert tuning._load() == tuning._DEFAULTS


def test_non_object_json_falls_back(monkeypatch, tmp_path):
    p = tmp_path / "tuning.json"
    p.write_text("[1, 2]")                    # valid JSON, wrong shape
    monkeypatch.setattr(tuning, "_PATH", p)
    assert tuning._load() == tuning._DEFAULTS


def test_bad_value_degrades_whole_file(monkeypatch, tmp_path):
    p = tmp_path / "tuning.json"
    p.write_text(json.dumps(dict(eeg_bank=True,
                                 pallas_min_n="not-a-number")))
    monkeypatch.setattr(tuning, "_PATH", p)
    # a partial/corrupt battery write must not ship half a configuration
    assert tuning._load() == tuning._DEFAULTS


def test_env_overrides_file(monkeypatch, tmp_path):
    """The REAL import-time resolution: env beats file beats defaults —
    exercised by reloading the module (the A/B battery flips candidates
    via these env vars; a typo'd name would silently bench the default
    kernels)."""
    p = tmp_path / "tuning.json"
    p.write_text(json.dumps(dict(pallas_min_n=80, eeg_batch=32,
                                 feature_na_max=96)))
    monkeypatch.setenv("TDA_TPU_TUNING_FILE", str(p))
    monkeypatch.setenv("TDA_TPU_PALLAS_MIN_N", "100")
    monkeypatch.setenv("TDA_TPU_EEG_BATCH", "8")
    try:
        importlib.reload(tuning)
        assert tuning.PALLAS_MIN_N == 100               # env beats file
        assert tuning.EEG_BATCH == 8                    # env beats file
        assert tuning.FEATURE_NA_MAX == 96              # file beats default
    finally:
        monkeypatch.undo()
        importlib.reload(tuning)                        # restore module state


def _wt():
    sys.path.insert(0, str(SCRATCH))
    try:
        import write_tuning
        return importlib.reload(write_tuning)
    finally:
        sys.path.pop(0)


def test_apply_bank_gate_and_merge(monkeypatch, tmp_path):
    """eeg_bank promotes only on an end-to-end win, merges with (never
    clobbers) knobs promoted by the kernel step, and a degraded (ok=false)
    or missing bank bench leaves tuning.json untouched."""
    wt = _wt()
    bd = tmp_path / "bd.out"
    bb = tmp_path / "bb.out"
    tj = tmp_path / "tuning.json"
    monkeypatch.setattr(wt, "BENCH_DEFAULT", bd)
    monkeypatch.setattr(wt, "BENCH_BANK", bb)
    monkeypatch.setattr(wt, "TUNING", tj)
    monkeypatch.setattr(sys, "argv", ["write_tuning.py", "--apply-bank"])

    bd.write_text('{"metric": "full_study_seconds", "value": 100.0}\n')
    bb.write_text('{"metric": "full_study_seconds", "value": 110.0}\n')
    wt.main()
    assert not tj.exists()                           # regression → untouched

    bb.write_text('{"metric": "full_study_seconds", "value": 80.0, '
                  '"ok": false}\n')
    wt.main()
    assert not tj.exists()                           # degraded → untouched

    # a winning run that never actually served from the bank (fallback)
    # measured the default path — must not promote
    bb.write_text('{"metric": "full_study_seconds", "value": 80.0, '
                  '"ok": true, "detail": {"bank_batches": 0}}\n')
    wt.main()
    assert not tj.exists()

    tj.write_text(json.dumps(dict(audio_chains=2,
                                  measured=dict(kernel_ab="x"))))
    bb.write_text('{"metric": "full_study_seconds", "value": 80.0, '
                  '"ok": true, "detail": {"bank_batches": 90}}\n')
    wt.main()
    data = json.loads(tj.read_text())
    assert data["eeg_bank"] is True
    assert data["audio_chains"] == 2                 # kernel knob preserved
    assert data["measured"]["kernel_ab"] == "x"
    assert data["measured"]["full_study_bank_s"] == 80.0
    # and the loader accepts the merged file
    monkeypatch.setattr(tuning, "_PATH", tj)
    assert tuning._load()["eeg_bank"] is True


def test_new_knob_defaults_env_and_file(monkeypatch, tmp_path):
    """eeg_batch/tda_chunk: defaults 16/256, file beats default, env beats
    file — same resolution contract as the kernel knobs."""
    monkeypatch.setattr(tuning, "_PATH", tmp_path / "tuning.json")
    d = tuning._load()
    assert d["eeg_batch"] == 16 and d["tda_chunk"] == 256

    p = tmp_path / "tuning.json"
    p.write_text(json.dumps(dict(eeg_batch=32)))
    monkeypatch.setenv("TDA_TPU_TUNING_FILE", str(p))
    monkeypatch.setenv("TDA_TPU_TDA_CHUNK", "128")
    try:
        importlib.reload(tuning)
        assert tuning.EEG_BATCH == 32                # file beats default
        assert tuning.TDA_CHUNK == 128               # env beats default
    finally:
        monkeypatch.undo()
        importlib.reload(tuning)


def test_apply_batch_gate(monkeypatch, tmp_path):
    """eeg_batch promotes only when the batch bench beats EVERY prior
    bench (default and bank); a bank-promoted tree whose batch bench fell
    back to the in-call path must not promote."""
    wt = _wt()
    bd = tmp_path / "bd.out"
    bb = tmp_path / "bb.out"
    bt = tmp_path / "bt.out"
    tj = tmp_path / "tuning.json"
    monkeypatch.setattr(wt, "BENCH_DEFAULT", bd)
    monkeypatch.setattr(wt, "BENCH_BANK", bb)
    monkeypatch.setattr(wt, "BENCH_BATCH", bt)
    monkeypatch.setattr(wt, "TUNING", tj)
    monkeypatch.setattr(sys, "argv", ["write_tuning.py", "--apply-batch",
                                      "32"])

    bd.write_text('{"metric": "full_study_seconds", "value": 100.0}\n')
    bb.write_text('{"metric": "full_study_seconds", "value": 80.0}\n')
    # beats default but NOT the bank bench → untouched
    bt.write_text('{"metric": "full_study_seconds", "value": 90.0, '
                  '"ok": true}\n')
    wt.main()
    assert not tj.exists()

    # compile-helper OOM path: no number → untouched
    bt.write_text("RuntimeError: compile helper 500\n")
    wt.main()
    assert not tj.exists()

    # bank promoted, but the batch run never served from the bank: it
    # measured a fallback, not the promoted configuration → untouched
    tj.write_text(json.dumps(dict(eeg_bank=True)))
    bt.write_text('{"metric": "full_study_seconds", "value": 70.0, '
                  '"ok": true, "detail": {"bank_batches": 0}}\n')
    wt.main()
    assert json.loads(tj.read_text()) == dict(eeg_bank=True)

    bt.write_text('{"metric": "full_study_seconds", "value": 70.0, '
                  '"ok": true, "detail": {"bank_batches": 45}}\n')
    wt.main()
    data = json.loads(tj.read_text())
    assert data["eeg_batch"] == 32
    assert data["eeg_bank"] is True                  # bank knob preserved
    assert data["measured"]["full_study_batch_s"] == 70.0
    # and the loader accepts the merged file
    monkeypatch.setattr(tuning, "_PATH", tj)
    assert tuning._load()["eeg_batch"] == 32


def test_apply_crossover(monkeypatch, tmp_path):
    """pallas_min_n comes from the sweep: smallest n from which pallas
    wins at every measured size above; any bars-match failure voids the
    sweep; pallas-never-wins routes nothing to pallas."""
    wt = _wt()
    co = tmp_path / "co.out"
    tj = tmp_path / "tuning.json"
    monkeypatch.setattr(wt, "CROSSOVER_OUT", co)
    monkeypatch.setattr(wt, "TUNING", tj)

    co.write_text(
        "n=  48  bitset   0.150 ms/win   pallas   0.200 ms/win   "
        "winner=bitset   bars-match=True\n"
        "n=  64  bitset   0.200 ms/win   pallas   0.210 ms/win   "
        "winner=bitset   bars-match=True\n"
        "n=  80  bitset   0.900 ms/win   pallas   0.300 ms/win   "
        "winner=pallas   bars-match=True\n"
        "n=  96  bitset   2.000 ms/win   pallas   0.350 ms/win   "
        "winner=pallas   bars-match=True\n"
        "n= 124  bitset   5.700 ms/win   pallas   0.410 ms/win   "
        "winner=pallas   bars-match=True\n")
    assert wt.crossover_candidate() == 80

    # non-monotone winner: only the contiguous top run counts
    co.write_text(
        "n=  48  bitset   0.1 ms/win   pallas   0.05 ms/win   "
        "winner=pallas   bars-match=True\n"
        "n=  64  bitset   0.1 ms/win   pallas   0.20 ms/win   "
        "winner=bitset   bars-match=True\n"
        "n=  80  bitset   0.9 ms/win   pallas   0.30 ms/win   "
        "winner=pallas   bars-match=True\n")
    assert wt.crossover_candidate() == 80

    # a single on-device mismatch voids the sweep
    co.write_text(
        "n=  80  bitset   0.9 ms/win   pallas   0.3 ms/win   "
        "winner=pallas   bars-match=False\n")
    assert wt.crossover_candidate() is None

    # pallas never wins → sentinel above the largest measured size
    co.write_text(
        "n=  80  bitset   0.2 ms/win   pallas   0.3 ms/win   "
        "winner=bitset   bars-match=True\n"
        "n= 124  bitset   0.2 ms/win   pallas   0.3 ms/win   "
        "winner=bitset   bars-match=True\n")
    assert wt.crossover_candidate() == 125

    # a degenerate timing row (< 0.01 ms/win — the r4 sweep's n=48 read
    # 0.000/0.000) voids the whole sweep: no promotion from artifacts
    co.write_text(
        "n=  48  bitset   0.000 ms/win   pallas   0.000 ms/win   "
        "winner=bitset   bars-match=True\n"
        "n= 124  bitset   5.7 ms/win   pallas   0.4 ms/win   "
        "winner=pallas   bars-match=True\n")
    assert wt.crossover_candidate() is None

    # --apply-crossover end to end: merge + loader round trip
    co.write_text(
        "n=  64  bitset   0.2 ms/win   pallas   0.1 ms/win   "
        "winner=pallas   bars-match=True\n"
        "n= 124  bitset   5.7 ms/win   pallas   0.4 ms/win   "
        "winner=pallas   bars-match=True\n")
    tj.write_text(json.dumps(dict(eeg_bank=True)))
    monkeypatch.setattr(sys, "argv", ["write_tuning.py", "--apply-crossover"])
    wt.main()
    data = json.loads(tj.read_text())
    assert data["pallas_min_n"] == 64 and data["eeg_bank"] is True
    monkeypatch.setattr(tuning, "_PATH", tj)
    assert tuning._load()["pallas_min_n"] == 64


def test_apply_chunk_gate(monkeypatch, tmp_path):
    """tda_chunk/feature_na_max promote from the features sweep only on a
    time win at MATCHING overflow count vs the (256, 128) default."""
    wt = _wt()
    ch = tmp_path / "ch.out"
    tj = tmp_path / "tuning.json"
    monkeypatch.setattr(wt, "CHUNKS_OUT", ch)
    monkeypatch.setattr(wt, "TUNING", tj)

    # warm rows must be ignored; min across reps per config
    ch.write_text(
        "warm: chunk=256 na_max=128 60.00s  0.3000 ms/win  ovf=0 chk=1\n"
        "warm: chunk=512 na_max=64 50.00s  0.2500 ms/win  ovf=0 chk=1\n"
        "rep0: chunk=256 na_max=128 10.00s  0.0500 ms/win  ovf=0 chk=1\n"
        "rep0: chunk=512 na_max=64 9.00s  0.0450 ms/win  ovf=0 chk=1\n"
        "rep1: chunk=256 na_max=128 8.00s  0.0400 ms/win  ovf=0 chk=1\n"
        "rep1: chunk=512 na_max=64 7.00s  0.0350 ms/win  ovf=0 chk=1\n")
    c = wt.chunk_candidate()
    assert c["tda_chunk"] == 512 and c["feature_na_max"] == 64
    assert c["s"] == 7.0 and c["s_default"] == 8.0

    # a faster config with EXTRA overflows (hidden exact-redo cost) loses
    ch.write_text(
        "rep0: chunk=256 na_max=128 10.00s  0.0500 ms/win  ovf=2 chk=1\n"
        "rep0: chunk=1024 na_max=64 5.00s  0.0250 ms/win  ovf=9 chk=1\n")
    assert wt.chunk_candidate() is None

    # default slowest-but-only config, or missing default → no promotion
    ch.write_text(
        "rep0: chunk=512 na_max=64 5.00s  0.0250 ms/win  ovf=0 chk=1\n")
    assert wt.chunk_candidate() is None

    # end to end: merge preserves other knobs
    ch.write_text(
        "rep0: chunk=256 na_max=128 10.00s  0.0500 ms/win  ovf=1 chk=1\n"
        "rep0: chunk=512 na_max=64 7.00s  0.0350 ms/win  ovf=1 chk=1\n")
    tj.write_text(json.dumps(dict(eeg_bank=True)))
    monkeypatch.setattr(sys, "argv", ["write_tuning.py", "--apply-chunk"])
    wt.main()
    data = json.loads(tj.read_text())
    assert data["tda_chunk"] == 512 and data["feature_na_max"] == 64
    assert data["eeg_bank"] is True
    monkeypatch.setattr(tuning, "_PATH", tj)
    assert tuning._load()["feature_na_max"] == 64
