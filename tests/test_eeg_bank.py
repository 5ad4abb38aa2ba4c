"""EEG diagram bank: the comparison stage reusing the features stage's
per-window diagrams (programs.comparison_from_bank, tuning knob eeg_bank).

Three layers:
  * the host replication of the device's paired-window selection (the
    bank gather indices must address exactly the windows the device
    program would have selected — audio_takens_program's f32 linspace);
  * program-level parity: comparison_from_bank fed from
    eeg_feature_program(return_bank=True) must equal comparison_program
    bit for bit at tiny shapes (identical diagrams → identical Sinkhorn
    inputs → identical outputs);
  * driver-level parity (slow tier): StudyRunner(eeg_bank=True) rows ==
    StudyRunner(eeg_bank=False) rows on a synthetic dataset, with the
    bank path verified to have actually served batches.
"""
import dataclasses
import os

import numpy as np
import pytest
import jax.numpy as jnp

from tda_eeg_audio_tpu.config import DEFAULT_CONFIG

slow = pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                          reason="set RUN_SLOW=1 (long CPU compile)")


def test_host_pair_idx_matches_device():
    """The host formula (study._paired_window_idx — the arithmetic the
    driver bakes into the bank's union columns) must reproduce the device
    linspace EXACTLY for every plausible window count (a one-off rounding
    difference would silently pair the wrong window)."""
    from tda_eeg_audio_tpu.models.programs import audio_takens_program
    from tda_eeg_audio_tpu.models.study import _paired_window_idx

    cfg = DEFAULT_CONFIG
    fs_a, fs_e = cfg.fs_audio, cfg.fs_eeg
    win, step = cfg.win_samples, cfg.step_samples
    K = cfg.max_windows
    counts = np.array([1, 2, 5, 14, 15, 16, 17, 23, 38, 39, 40, 55, 89],
                      np.int64)
    n_rs = win + (counts - 1) * step
    n_a = (n_rs * fs_a // fs_e).astype(np.int32)
    rng = np.random.default_rng(0)
    audio = np.zeros((len(counts), int(n_a.max())), np.float32)
    for i, n in enumerate(n_a):
        audio[i, :n] = rng.standard_normal(n)
    aud = audio_takens_program(jnp.asarray(audio), jnp.asarray(n_a), cfg,
                               5900, 90, K)
    n_win = np.array(aud["n_win"])
    use_idx = np.array(aud["use_idx"])
    np.testing.assert_array_equal(n_win, counts)
    for i, c in enumerate(counts):
        np.testing.assert_array_equal(use_idx[i],
                                      _paired_window_idx(int(c), K),
                                      err_msg=f"n_pair={c}")


def _union_bank(case, na_max=128):
    """Build the UNION bank the driver builds (models/study.py
    compute_feature_dataset with_bank): md5-sampled feature columns under
    "min" equalization plus K_CMP paired union columns (mask=False), and
    the flat gather indices addressing the union columns."""
    from tda_eeg_audio_tpu.models.programs import eeg_feature_program

    B = case["eeg"].shape[0]
    K, K_feat, Kx = case["K"], case["K_feat"], case["K_feat"] + case["K"]
    _, _, bank = eeg_feature_program(
        jnp.asarray(case["eeg"]), jnp.asarray(case["n_e"]),
        jnp.asarray(case["use_idx"]), jnp.asarray(case["use_mask"]),
        case["cfg"], case["n_win_max"], Kx, chunk=16, na_max=na_max,
        return_bank=True)
    bank = dict(bank)
    # the (B,) ovf leaf flags truncation on ANY column (union ones
    # included) — it rides the packed readback, not the bank gather
    bank_ovf = np.asarray(bank.pop("ovf"))
    assert bank_ovf.shape == (B,) and not bank_ovf.any()
    flat = {k: jnp.asarray(np.asarray(v).reshape(
        B * 5 * Kx, *np.asarray(v).shape[2:])) for k, v in bank.items()}
    gidx = np.zeros((B, 5, K), np.int64)
    cols = K_feat + np.arange(K)
    for bi in range(B):
        for bd in range(5):
            gidx[bi, bd] = (bi * 5 + bd) * Kx + cols
    return flat, gidx.reshape(-1).astype(np.int32)


def _tiny_bank_case():
    """Shared tiny-shape fixture: reference comparison_program outputs plus
    the union-bank leaves / gather indices feeding comparison_from_bank.
    The md5 sample deliberately does NOT cover every paired window (the
    study's actual regime: "min" equalization over variable-length
    recordings), so parity here proves the union columns serve."""
    from tda_eeg_audio_tpu.models import classify
    from tda_eeg_audio_tpu.models.programs import (
        audio_h1_program, audio_takens_program, comparison_program,
        window_count_program)
    from tda_eeg_audio_tpu.models.study import _paired_window_idx

    cfg = dataclasses.replace(DEFAULT_CONFIG, window_sec=0.2, fir_numtaps=101)
    B, n_win_max, n_rs_max, K = 2, 12, 300, 5
    win, step = cfg.win_samples, cfg.step_samples
    n_e = np.array([win + 7 * step, win + 8 * step], np.int32)  # 8, 9 windows
    T = win + (n_win_max - 1) * step
    rng = np.random.default_rng(0)
    eeg = np.zeros((B, 47, T), np.float32)
    for i, n in enumerate(n_e):
        eeg[i, :, :n] = rng.standard_normal((47, n))
    n_a = (n_e * cfg.fs_audio // cfg.fs_eeg).astype(np.int32)
    audio = np.zeros((B, int(n_a.max())), np.float32)
    for i, n in enumerate(n_a):
        audio[i, :n] = rng.standard_normal(n)
    mis = audio[::-1].copy()
    n_mis = n_a[::-1].copy()
    mo = audio_h1_program(jnp.asarray(mis), jnp.asarray(n_mis), cfg,
                          n_rs_max, n_win_max, K, aud_chunk=16)
    mis_args = ((mo["h1_b"], mo["h1_d"], mo["h1_m"]), mo["n_win"],
                mo["degen"])

    ref = comparison_program(
        jnp.asarray(eeg), jnp.asarray(n_e), jnp.asarray(audio),
        jnp.asarray(n_a), *mis_args, cfg,
        n_win_max, n_rs_max, K, eeg_chunk=16, aud_chunk=16)
    ref = {k: np.asarray(v) for k, v in ref.items()}

    # the device's paired selection must agree with the host replication
    # the driver bakes into the union columns
    n_win_e = np.array(window_count_program(
        jnp.asarray(n_e), win, step, T))
    aud = audio_takens_program(jnp.asarray(audio), jnp.asarray(n_a), cfg,
                               n_rs_max, n_win_max, K,
                               n_win_cap=jnp.asarray(n_win_e))
    comp = np.array(aud["use_idx"])                            # (B, K)
    for bi in range(B):
        np.testing.assert_array_equal(
            comp[bi], _paired_window_idx(int(np.array(aud["n_win"])[bi]), K))

    # features stage under "min" equalization: K_feat = min window count,
    # md5-sampled per band, paired windows appended as union columns
    nw = np.array([(n - win) // step + 1 for n in n_e])
    K_feat = int(nw.min())
    Kx = K_feat + K
    from tda_eeg_audio_tpu.config import FREQ_BANDS
    BANDS = list(FREQ_BANDS)
    use_idx = np.zeros((B, 5, Kx), np.int32)
    use_mask = np.zeros((B, 5, Kx), bool)
    for bi in range(B):
        take = min(K_feat, int(nw[bi]))
        for bd in range(5):
            sel = classify.window_sample_indices(
                f"rec{bi}", BANDS[bd], int(nw[bi]), take,
                cfg.window_sampling, cfg.window_sample_seed)
            use_idx[bi, bd, :len(sel)] = sel
            use_mask[bi, bd, :len(sel)] = True
        use_idx[bi, :, K_feat:] = comp[bi]
    # at least one paired window must fall OUTSIDE its md5 sample, else
    # this case would not exercise the union columns
    assert any(set(comp[bi]) - set(use_idx[bi, bd, :K_feat].tolist())
               for bi in range(B) for bd in range(5))
    case = dict(cfg=cfg, ref=ref, eeg=eeg, n_e=n_e,
                audio=audio, n_a=n_a, mis_args=mis_args, K_feat=K_feat,
                use_idx=use_idx, use_mask=use_mask,
                n_win_max=n_win_max, n_rs_max=n_rs_max, K=K, T=T)
    case["flat"], case["gidx"] = _union_bank(case)
    return case


def _run_bank(case, put=lambda x: jnp.asarray(x)):
    from tda_eeg_audio_tpu.models.programs import comparison_from_bank

    out = comparison_from_bank(
        {k: put(v) for k, v in case["flat"].items()}, put(case["gidx"]),
        put(case["n_e"]), put(case["audio"]), put(case["n_a"]),
        *case["mis_args"], case["cfg"], case["n_win_max"], case["n_rs_max"],
        case["K"], aud_chunk=16, t_eeg_pad=case["T"])
    return {k: np.asarray(v) for k, v in out.items()}


def test_comparison_from_bank_matches_default_tiny():
    """Program-level parity at tiny shapes: the bank path must reproduce
    comparison_program exactly — same Wasserstein, same Spearman, same
    flags — when fed the features stage's per-window bank."""
    case = _tiny_bank_case()
    out = _run_bank(case)
    assert set(out) == set(case["ref"])
    for k in case["ref"]:
        np.testing.assert_array_equal(out[k], case["ref"][k], err_msg=k)


def test_comparison_from_bank_sharded_matches():
    """The bank path GSPMD-partitioned over a dp mesh (bank rows, gather
    indices and inputs all dp-sharded exactly as StudyRunner._put places
    them) must match the single-device outputs — a later tuning.json
    promotion of eeg_bank must not break the multi-chip dryrun."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    case = _tiny_bank_case()
    for dp in (2,):
        mesh = Mesh(np.array(jax.devices()[:dp]), ("dp",))

        def put(a):
            a = jnp.asarray(a)
            return jax.device_put(
                a, NamedSharding(mesh, P("dp", *([None] * (a.ndim - 1)))))

        out = _run_bank(case, put)
        for k in case["ref"]:
            np.testing.assert_array_equal(out[k], case["ref"][k], err_msg=k)


@slow
def test_studyrunner_bank_rows_match_default():
    """Driver-level parity: StudyRunner(eeg_bank=True) must produce the
    same comparison rows as the default runner on a synthetic dataset —
    and must actually have served every batch from the bank."""
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.study import StudyRunner

    def rows_of(bank):
        r = StudyRunner(SynthDataset(n_subjects=2, n_per_subject=1),
                        eeg_batch=4, tda_chunk=64, verbose=False,
                        eeg_bank=bank)
        r.compute_feature_dataset()
        rows = r._fused_rows()
        return r, rows

    r_b, rows_b = rows_of(True)
    r_d, rows_d = rows_of(False)
    assert r_b._eeg_bank is not None
    assert r_b._bank_served > 0 and r_b._bank_fallback == 0
    assert len(rows_b) == len(rows_d) > 0
    key = lambda r: (r["filename"], r["band"])
    mb = {key(r): r for r in rows_b}
    for rd in rows_d:
        rb = mb[key(rd)]
        assert set(rb) == set(rd)
        for k, v in rd.items():
            if isinstance(v, float):
                assert (np.isnan(v) and np.isnan(rb[k])) or rb[k] == v, \
                    (k, key(rd), rb[k], v)
            else:
                assert rb[k] == v, (k, key(rd))


def test_comparison_from_bank_narrow_rows_tiny():
    """A feature_na_max=64 bank (the sweep's candidate arena width,
    tuning.FEATURE_NA_MAX) produces 64-wide H1 rows; comparison_from_bank
    must slice them through W=min(96, width) and still reproduce
    comparison_program bit for bit whenever nothing overflows (EEG creator
    counts top out far below 64 at study shapes)."""
    case = _tiny_bank_case()
    # rebuild the bank at the narrow arena width
    flat, gidx = _union_bank(case, na_max=64)
    assert flat["h1_m"].shape[-1] == 64          # the narrow rows, really
    case = {**case, "flat": flat, "gidx": gidx}
    out = _run_bank(case)
    for k in case["ref"]:
        np.testing.assert_array_equal(out[k], case["ref"][k], err_msg=k)
