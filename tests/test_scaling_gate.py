"""The scaling probe's exponent gate (VERDICT r4 #10): a quadratic
regression must FAIL the check run, not ship inside a green report.
The checker itself is pure arithmetic, so these tests run without
Spark; the subprocess test pins the actual exit code."""

import subprocess
import sys

sys.path.insert(0, "/root/repo")

from tools.scaling_probe import (  # noqa: E402
    DOCUMENTED_CEILINGS,
    check_exponents,
    exponent,
)

FACTORS = [1, 2, 4, 8]


def test_linear_family_passes():
    assert check_exponents(
        {"ok": {1: 1.0, 2: 2.0, 4: 4.1, 8: 8.3}}, FACTORS
    ) == []


def test_injected_quadratic_fails():
    bad = check_exponents(
        {"boom": {1: 1.0, 2: 4.0, 4: 16.0, 8: 64.0}}, FACTORS
    )
    assert len(bad) == 1 and "boom" in bad[0] and "2.00" in bad[0]


def test_documented_family_gets_its_ceiling_not_a_pass():
    assert "trigram_join" in DOCUMENTED_CEILINGS
    # measured-tradeoff territory (~1.1): allowed
    ok = {"trigram_join": {1: 1.0, 2: 2.1, 4: 4.6, 8: 9.8}}
    assert check_exponents(ok, FACTORS) == []
    # an actual quadratic still fails even though documented
    boom = {"trigram_join": {1: 1.0, 2: 4.0, 4: 16.0, 8: 64.0}}
    assert len(check_exponents(boom, FACTORS)) == 1


def test_sub_second_noise_and_missing_factors_are_nan_safe():
    assert check_exponents({"flat": {1: 0.0, 2: 0.0, 4: 0.0, 8: 0.0}}, FACTORS) == []
    assert check_exponents({"one": {1: 1.0}}, [1]) == []
    e = exponent({1: 1.0}, [1])
    assert e != e  # NaN


def test_selftest_mode_exits_nonzero():
    """`--selftest-quadratic` is the end-to-end pin: the probe binary
    itself exits 1 on an injected quadratic fixture."""
    proc = subprocess.run(
        [sys.executable, "tools/scaling_probe.py", "--selftest-quadratic"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 1
    assert "selftest_quadratic" in proc.stdout
    assert "selftest_linear" not in proc.stdout  # linear family passes
