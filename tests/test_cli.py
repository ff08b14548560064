import numpy as np
import pytest

from sphtpu.cli import build_parser, main, parse_kwargs_string
from sphtpu.io import read_snapshot, snapshot_path


def test_kwargs_coercion_order():
    """bool -> int -> float -> str, exactly sph_manager.jl:83-94."""
    out = parse_kwargs_string("a=true,b=False,c=42,d=4.5,e=1e3,f=hello")
    assert out["a"] is True and out["b"] is False
    assert out["c"] == 42 and isinstance(out["c"], int)
    assert out["d"] == 4.5
    assert out["e"] == 1000.0 and isinstance(out["e"], float)
    assert out["f"] == "hello"
    assert parse_kwargs_string("") == {}


def test_parser_defaults_match_reference():
    args = build_parser().parse_args(
        ["--EOS", "polytropic", "--ic_type", "gaussian_sphere"]
    )
    assert args.snapID == 1
    assert args.snapInterval == 10
    assert args.keepSnaps is True
    assert args.showPlots is True
    assert not args.generate and not args.run


def test_generate_via_cli_with_unicode_kwargs(tmp_path):
    """The reference README uses unicode kwarg names (Ω_frac); both the
    unicode and ASCII spellings must reach the generator."""
    rc = main(
        [
            "--generate",
            "--EOS",
            "polytropic",
            "--ic_type",
            "boss_bodenheimer",
            "--kwargs",
            "N=200,β=0.2,A=0.05",
            "--root",
            str(tmp_path),
        ]
    )
    assert rc == 0
    snap = read_snapshot(snapshot_path(str(tmp_path), "boss_bodenheimer", "1"))
    assert snap["pos"].shape == (200, 3)
    # rotation present (beta > 0)
    lz = (
        snap["pos"][:, 0] * snap["vel"][:, 1]
        - snap["pos"][:, 1] * snap["vel"][:, 0]
    ).sum()
    assert lz > 0


def test_bad_eos_message(capsys, tmp_path):
    rc = main(
        ["--run", "--EOS", "adiabatic", "--ic_type", "x", "--root", str(tmp_path)]
    )
    assert rc == 1
    out = capsys.readouterr().out
    assert "No EOS of type adiabatic exists" in out


def test_bonnor_ebert_velocity_modes(tmp_path):
    from sphtpu.scenes import iniconds_setup

    for mode in ("none", "mach", "virial"):
        path = iniconds_setup(
            "isothermal",
            "bonnor_ebert_sphere",
            root=str(tmp_path / mode),
            N=300,
            velocity_mode=mode,
        )
        snap = read_snapshot(path)
        v = snap["vel"]
        if mode == "none":
            assert np.abs(v).max() == 0.0
        else:
            assert np.abs(v).max() > 0
            # zero net momentum (iniconds.jl:176,187)
            assert np.abs(v.mean(axis=0)).max() < 1e-8 * np.abs(v).max()
