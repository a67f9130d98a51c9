"""Example smoke tests (reference test_examples.py:5-16 exec()s its
example scripts the same way).  Heavy examples (50-view retrieval, 4D
dynamic, multichip) are exercised at reduced scale by the dedicated test
modules; here the light ones run verbatim."""
import os
import runpy

import matplotlib
import pytest

matplotlib.use("Agg")

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


def run_example(name, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # example scripts save figures to cwd
    runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")


def test_memory_usage(tmp_path, monkeypatch, capsys):
    run_example("memory_usage.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "Memory Usage" in out


def test_single_vantage(tmp_path, monkeypatch):
    run_example("single_vantage.py", tmp_path, monkeypatch)
    assert (tmp_path / "single_vantage.png").exists()


def test_sph_harm_retrieval(tmp_path, monkeypatch, capsys):
    run_example("sph_harm_retrieval.py", tmp_path, monkeypatch)
    assert (tmp_path / "sph_harm_retrieval.png").exists()
    rel = float(capsys.readouterr().out.split("relative volume error:")[1]
                .split()[0])
    assert rel < 0.2, rel


def test_aot_serving(tmp_path, monkeypatch, capsys):
    run_example("aot_serving.py", tmp_path, monkeypatch)
    assert "OK" in capsys.readouterr().out


def test_poisson_retrieval(tmp_path, monkeypatch, capsys):
    run_example("poisson_retrieval.py", tmp_path, monkeypatch)
    assert (tmp_path / "poisson_retrieval.png").exists()
    out = capsys.readouterr().out
    em = float(out.split("ML-EM relative volume error:")[1].split()[0])
    cgr = float(out.split("CGNR relative volume error:")[1].split()[0])
    # the physically matched solver wins on Poisson data
    assert em < cgr
    assert em < 0.2, em
