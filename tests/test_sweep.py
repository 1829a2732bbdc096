"""Sweep-driver tests: result files, adaptive stepping, resume semantics.

The drivers are the framework's user surface (plot_BLER_vs_SNR.m /
plot_SNR_vs_A.m equivalents); these tests run tiny configs on the CPU mesh
and additionally pin the crash-recovery contract: a rerun with resume=True
skips every point already in the results file and reproduces the remaining
curve.
"""
import os

import numpy as np
import pytest

from ldpc_3gpp_tpu.parallel.sweep import (
    CAPPED_PREFIX,
    _make_config,
    _scan_resume_file,
    bler_vs_snr,
    snr_vs_a,
)

CFG = dict(
    A=[100],
    rate=[1 / 2],
    bg=[2],
    modulation="QPSK",
    iterations=5,
    algorithm="min-sum",
    batch_per_device=32,
    seed=3,
    verbose=False,
)


def test_bler_vs_snr_smoke(tmp_path):
    """Quick-tier driver smoke: one tiny config end to end, file written."""
    out = bler_vs_snr(A=[100], rate=[1 / 2], bg=[2], modulation="QPSK",
                      iterations=4, algorithm="min-sum", batch_per_device=16,
                      seed=1, verbose=False, target_block_errors=2,
                      target_bler=0.5, esn0_start=4.0, esn0_delta=1.0,
                      results_dir=str(tmp_path))
    pts = out[(2, 1 / 2, 100)]
    assert pts and pts[-1].bler <= 0.5
    assert len(os.listdir(str(tmp_path))) == 1


@pytest.mark.slow
def test_bler_vs_snr_live_plot(tmp_path):
    """live_plot=True renders a PNG after every point (the headless
    equivalent of the reference's per-block figure, plot_BLER_vs_SNR.m:157)."""
    bler_vs_snr(A=[100], rate=[1 / 2], bg=[2], modulation="QPSK",
                iterations=4, algorithm="min-sum", batch_per_device=16,
                seed=1, verbose=False, target_block_errors=2,
                target_bler=0.5, esn0_start=4.0, esn0_delta=1.0,
                results_dir=str(tmp_path), live_plot=True)
    png = os.path.join(str(tmp_path), "BLER_vs_SNR_live.png")
    assert os.path.exists(png) and os.path.getsize(png) > 1000


def test_bler_vs_snr_waterfall_and_resume(tmp_path):
    d = str(tmp_path)
    out = bler_vs_snr(target_block_errors=8, target_bler=2e-1,
                      esn0_start=1.0, esn0_delta=1.0, results_dir=d, **CFG)
    pts = out[(2, 1 / 2, 100)]
    assert pts and pts[-1].bler <= 2e-1
    # every point here reached its error target: none may read as capped
    assert all(not p.capped for p in pts)
    files = os.listdir(d)
    assert len(files) == 1
    rows = np.loadtxt(os.path.join(d, files[0]), ndmin=2)
    # waterfall: BLER at the last SNR is the lowest recorded
    assert rows[-1, 1] == rows[:, 1].min()

    # truncate the file to simulate a crash after the first point, rerun
    # with resume: the completed point must be skipped, the rest re-measured
    kept = rows[:1]
    with open(os.path.join(d, files[0]), "w") as f:
        f.write(f"{kept[0, 0]:f}\t{kept[0, 1]:e}\n")
    out2 = bler_vs_snr(target_block_errors=8, target_bler=2e-1,
                       esn0_start=1.0, esn0_delta=1.0, results_dir=d,
                       resume=True, **CFG)
    rows2 = np.loadtxt(os.path.join(d, files[0]), ndmin=2)
    np.testing.assert_allclose(rows2[0], kept[0])
    assert rows2.shape[0] >= rows.shape[0]  # curve completed again
    # the skipped point was not re-simulated (BLER=1 warmup points are not
    # recorded in the file, so those are legitimately re-run)
    assert all(p.esn0_db != kept[0, 0] for p in out2[(2, 1 / 2, 100)])


def test_capped_point_is_marked_not_silent(tmp_path):
    """A point that saturates max_blocks_per_point short of the error target
    must be flagged on the SweepPoint, annotated in the results file (in a
    way np.loadtxt still parses), and re-simulated on resume — never written
    as if it had converged (the reference runs to target unconditionally,
    plot_BLER_vs_SNR.m:104-171)."""
    d = str(tmp_path)
    kw = dict(CFG, iterations=4, batch_per_device=16)
    out = bler_vs_snr(target_block_errors=10_000, target_bler=0.5,
                      esn0_start=4.0, esn0_delta=1.0, results_dir=d,
                      max_blocks_per_point=64, **kw)
    pts = out[(2, 1 / 2, 100)]
    assert pts[-1].capped and pts[-1].blocks <= 2 * 64
    fname = os.path.join(d, os.listdir(d)[0])
    text = open(fname).read()
    assert CAPPED_PREFIX in text
    # the annotation is a comment line: reference-format consumers still work
    rows = np.loadtxt(fname, ndmin=2)
    assert rows.shape[1] == 2
    # resume treats the capped point as NOT done (re-simulates it)
    done = _scan_resume_file(
        fname, lambda p: (round(float(p[0]), 6), float(p[1]))
    )
    assert round(pts[-1].esn0_db, 6) not in done


def test_resume_rejects_corrupt_interior_line(tmp_path):
    """Only a torn FINAL line is crash debris; a malformed interior line
    means a corrupt/foreign file and must raise instead of silently
    resuming from partial data."""
    f = tmp_path / "BLER_vs_SNR_x.txt"
    f.write_text("1.0\t0.5\ngarbage line here\n2.0\t0.25\n")
    with pytest.raises(ValueError, match="malformed interior"):
        _scan_resume_file(str(f), lambda p: (float(p[0]), float(p[1])))
    # torn FINAL line: tolerated
    f.write_text("1.0\t0.5\n2.0\t0.2")  # complete; then a torn tail
    f.write_text(f.read_text() + "\n3.0\t")
    done = _scan_resume_file(str(f), lambda p: (float(p[0]), float(p[1])))
    assert done == {1.0: 0.5, 2.0: 0.2}


def test_resume_repairs_file_tail_and_capped_rows(tmp_path):
    """The scanner REWRITES the file before the sweep appends (advisor
    round-4, medium): a torn final line is truncated (otherwise the first
    appended point glues onto the fragment, corrupting that record and
    poisoning every later resume), and capped rows + their annotations are
    dropped (the resumed sweep re-simulates them; keeping both would leave
    duplicate Es/N0 entries with contradictory BLER values)."""
    parse = lambda p: (float(p[0]), float(p[1]))
    # torn tail: partial fields
    f = tmp_path / "BLER_vs_SNR_x.txt"
    f.write_text("1.0\t0.5\n2.0\t")
    assert _scan_resume_file(str(f), parse) == {1.0: 0.5}
    assert f.read_text() == "1.0\t0.5\n"
    # torn tail: complete fields but missing the newline (interrupted write)
    f.write_text("1.0\t0.5\n2.0\t0.2")
    assert _scan_resume_file(str(f), parse) == {1.0: 0.5}
    assert f.read_text() == "1.0\t0.5\n"
    # appending after repair yields a cleanly parseable file
    with open(f, "a") as fid:
        fid.write("2.0\t0.25\n")
    assert _scan_resume_file(str(f), parse) == {1.0: 0.5, 2.0: 0.25}
    # capped row + annotation: dropped from the file, point not done
    f.write_text("1.0\t0.5\n2.0\t0.2\n"
                 f"{CAPPED_PREFIX} 1/3 errors in 64 blocks\n3.0\t0.1\n")
    assert _scan_resume_file(str(f), parse) == {1.0: 0.5, 3.0: 0.1}
    assert f.read_text() == "1.0\t0.5\n3.0\t0.1\n"
    # a fully clean file is left byte-identical
    before = f.read_text()
    _scan_resume_file(str(f), parse)
    assert f.read_text() == before


def test_sweep_reaches_full_parameter_engine(tmp_path):
    """N_L / I_LBRM / TBS_LBRM / CBGTI thread from the experiment layer into
    LDPCParams (NRLDPC.m:51-85 makes these first-class tunables)."""
    cfg = _make_config(100, 1 / 2, 2, "QPSK", (0,), 4, "min-sum",
                       N_L=2, I_LBRM=1, TBS_LBRM=150)
    assert cfg.params.N_L == 2 and cfg.params.I_LBRM == 1
    assert cfg.params.G % (2 * 2) == 0
    assert cfg.params.N_cb < cfg.params.N  # LBRM actually limited the buffer
    # CBGTI passthrough (multi-code-block config so C' stays > 0)
    cfg2 = _make_config(5000, 1 / 3, 2, "QPSK", (0,), 4, "min-sum",
                        CBGTI=(1,))
    assert cfg2.params.C == 2 and cfg2.params.CBGTI == (1,)
    assert cfg2.params.CBGTI_flags == (1, 0)
    # and end-to-end through the Monte-Carlo path on the CPU mesh
    out = bler_vs_snr(target_block_errors=2, target_bler=0.9,
                      esn0_start=5.0, esn0_delta=1.0,
                      results_dir=str(tmp_path), N_L=2, I_LBRM=1,
                      TBS_LBRM=200,
                      **dict(CFG, iterations=4, batch_per_device=16))
    assert out[(2, 1 / 2, 100)]


@pytest.mark.slow
def test_snr_vs_a_interpolation_and_resume(tmp_path):
    d = str(tmp_path)
    kw = dict(CFG)
    a_list = kw.pop("A")
    kw["bg"] = kw.pop("bg")[0]
    kw["rate"] = [kw["rate"][0]]
    out = snr_vs_a(A=a_list + [200], target_block_errors=8, target_bler=2e-1,
                   esn0_start=0.0, esn0_delta=1.0, results_dir=d, **kw)
    curve = out[1 / 2]
    assert [a for a, _ in curve] == [100, 200]
    files = os.listdir(d)
    assert len(files) == 1
    rows = np.loadtxt(os.path.join(d, files[0]), ndmin=2)
    assert rows.shape == (2, 2)

    # crash after A=100: resume must skip it and re-measure only A=200
    with open(os.path.join(d, files[0]), "w") as f:
        f.write(f"{int(rows[0, 0])}\t{rows[0, 1]:f}\n")
    out2 = snr_vs_a(A=a_list + [200], target_block_errors=8, target_bler=2e-1,
                    esn0_start=0.0, esn0_delta=1.0, results_dir=d,
                    resume=True, **kw)
    rows2 = np.loadtxt(os.path.join(d, files[0]), ndmin=2)
    assert rows2.shape == (2, 2)
    np.testing.assert_allclose(rows2[0], rows[0])
    assert out2[1 / 2][0] == (100, rows[0, 1])


def test_plot_results_files_overlay(tmp_path):
    """The reference-format overlay plotter accepts files from any source
    (ours or MATLAB's share the layout), skips '#' annotations, and
    rejects mixed kinds on one figure."""
    from ldpc_3gpp_tpu.utils.plotting import plot_results_files

    b1 = tmp_path / "BLER_vs_SNR_100_0.5_2_QPSK_4_3_1_0.txt"
    b1.write_text("1.0\t5e-1\n2.0\t1e-1\n# capped 1/3 errors in 10 blocks\n"
                  "3.0\t1e-2\n")
    b2 = tmp_path / "BLER_vs_SNR_matlab_seed1.txt"
    b2.write_text("1.0\t4.5e-1\n2.0\t1.2e-1\n")
    out = plot_results_files([str(b1), str(b2)],
                             str(tmp_path / "overlay.png"))
    assert os.path.getsize(out) > 1000
    s = tmp_path / "SNR_vs_A_0.01_x.txt"
    s.write_text("1000\t-1.0\n2000\t-1.2\n")
    out2 = plot_results_files([str(s)], str(tmp_path / "snr.png"))
    assert os.path.getsize(out2) > 1000
    with pytest.raises(ValueError, match="mixed"):
        plot_results_files([str(b1), str(s)], str(tmp_path / "bad.png"))
    with pytest.raises(ValueError, match="kind"):
        plot_results_files([str(tmp_path / "other.txt")],
                           str(tmp_path / "bad2.png"))
