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


def test_static_retrieval_reduced(tmp_path, monkeypatch):
    """The full static-retrieval script (incl. its GIF/plotting paths) at
    env-shrunk scale (reference test_examples.py:5-16 execs the same
    script at full scale)."""
    monkeypatch.setenv("SPH_TPU_EXAMPLE_GRID", "10")
    monkeypatch.setenv("SPH_TPU_EXAMPLE_VIEWS", "6")
    monkeypatch.setenv("SPH_TPU_EXAMPLE_ITERS", "5")
    monkeypatch.setenv("SPH_TPU_EXAMPLE_PREVIEW", "24")
    run_example("static_retrieval.py", tmp_path, monkeypatch)
    assert (tmp_path / "static_retrieval1.gif").exists()
    assert (tmp_path / "static_retrieval2.gif").exists()


def test_dynamic_measurements_reduced(tmp_path, monkeypatch):
    monkeypatch.setenv("SPH_TPU_EXAMPLE_GRID", "10")
    monkeypatch.setenv("SPH_TPU_EXAMPLE_TBINS", "4")
    monkeypatch.setenv("SPH_TPU_EXAMPLE_PREVIEW", "24")
    run_example("dynamic_measurements.py", tmp_path, monkeypatch)
    assert (tmp_path / "dynamic.gif").exists()


def test_multichip_scaling_reduced(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("SPH_TPU_EXAMPLE_GRID", "12")
    monkeypatch.setenv("SPH_TPU_EXAMPLE_VIEWS", "4")
    run_example("multichip_scaling.py", tmp_path, monkeypatch)
    assert "rays/s" in capsys.readouterr().out


def test_poisson_retrieval(tmp_path, monkeypatch, capsys):
    run_example("poisson_retrieval.py", tmp_path, monkeypatch)
    assert (tmp_path / "poisson_retrieval.png").exists()
    out = capsys.readouterr().out
    em = float(out.split("ML-EM relative volume error:")[1].split()[0])
    cgr = float(out.split("CGNR relative volume error:")[1].split()[0])
    # the physically matched solver wins on Poisson data
    assert em < cgr
    assert em < 0.2, em


def test_volume_sharded_reduced(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("SPH_TPU_EXAMPLE_GRID", "12")
    monkeypatch.setenv("SPH_TPU_EXAMPLE_VIEWS", "4")
    monkeypatch.setenv("SPH_TPU_EXAMPLE_G", "128")
    run_example("volume_sharded.py", tmp_path, monkeypatch)
    assert "rays/s" in capsys.readouterr().out
