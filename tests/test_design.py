"""Filter-design parity: our SOS tables vs the reference's VERBOSE dumps."""
import numpy as np
import pytest

from demodulator_tpu.design.biquad import (
    design_sos, sos_section_count, BUTTER_LP, CHEBY1_LP, BUTTER_HP, CHEBY1_HP)
from tests.conftest import run_reference


def parse_verbose_sos(stderr: str) -> np.ndarray:
    """Parse the last SOS table from a VERBOSE design dump
    (src/filter.c:160-204 printf format)."""
    seg = stderr.split("k:")[-1]
    rows = []
    for line in seg.strip().splitlines()[1:]:
        vals = line.split()
        if len(vals) == 6:
            try:
                rows.append([float(v) for v in vals])
            except ValueError:
                break
        else:
            break
    return np.array(rows, dtype=np.float64)


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 8])
@pytest.mark.parametrize("family", [0, 1])
def test_lowpass_design_matches_reference(ref_binary_verbose, iq_data,
                                          degree, family):
    import subprocess, tempfile
    with tempfile.NamedTemporaryFile(suffix=".dat") as fin:
        fin.write(iq_data[:4096].tobytes())
        fin.flush()
        r = subprocess.run(
            [ref_binary_verbose, "-i", fin.name, "-o", "/dev/null", "-b", "-6",
             "-S", "192000", "-l", "12500", "-d", str(degree), "-e", "3",
             "-m", str(family)],
            capture_output=True, text=True)
    ref = parse_verbose_sos(r.stderr)
    mine = np.asarray(design_sos(family, degree, 12500, 192000, 0.3,
                                 dtype=np.float64))
    assert ref.shape == mine.shape == (sos_section_count(degree), 6)
    # dump precision is 6 decimals
    np.testing.assert_allclose(mine, ref, atol=2e-6)


def test_highpass_design_matches_reference(ref_binary_verbose, iq_data):
    """The only CLI-reachable highpass design is highpassDc's deg-3
    Butterworth HP at 1 Hz (-q 2, src/matrix.c:142-157)."""
    import subprocess, tempfile
    with tempfile.NamedTemporaryFile(suffix=".dat") as fin:
        fin.write(iq_data[:4096].tobytes())
        fin.flush()
        r = subprocess.run(
            [ref_binary_verbose, "-i", fin.name, "-o", "/dev/null", "-b", "-6",
             "-S", "192000", "-l", "12500", "-q", "2"],
            capture_output=True, text=True)
    # second design block printed is the HP one
    blocks = r.stderr.split("Highpass Butterworth selected")
    assert len(blocks) == 2
    ref = parse_verbose_sos(blocks[1])
    mine = np.asarray(design_sos(BUTTER_HP, 3, 1.0, 192000.0, 0.0,
                                 dtype=np.float64))
    np.testing.assert_allclose(mine, ref, atol=2e-6)


def test_cheby_hp_design_properties():
    """Cheby-I HP isn't CLI-reachable; sanity-check structure instead:
    zeros at z=+1 (b row ∝ [1,-2,1]) and stable a-side poles."""
    sos = np.asarray(design_sos(CHEBY1_HP, 4, 12500, 192000, 0.3,
                                dtype=np.float64))
    assert sos.shape == (2, 6)
    # b rows proportional to [1, -2, 1]
    for row in sos:
        np.testing.assert_allclose(row[1] / row[0], -2.0, rtol=1e-12)
        np.testing.assert_allclose(row[2] / row[0], 1.0, rtol=1e-12)
        # poles of the a-side polynomial z^2 + a1 z + a2 inside unit circle
        roots = np.roots([row[3], row[4], row[5]])
        assert np.all(np.abs(roots) < 1.0)


@pytest.mark.parametrize("mode", [BUTTER_LP, CHEBY1_LP, BUTTER_HP, CHEBY1_HP])
@pytest.mark.parametrize("degree", [1, 2, 3, 6, 7])
def test_design_shapes_and_finiteness(mode, degree):
    sos = design_sos(mode, degree, 6500, 96000, 0.2, dtype=np.float32)
    assert sos.shape == (sos_section_count(degree), 6)
    assert np.all(np.isfinite(sos))
    # a0 is always exactly 1 (src/filter.c:118,129; gain only scales b)
    np.testing.assert_array_equal(sos[:, 3], 1.0)
