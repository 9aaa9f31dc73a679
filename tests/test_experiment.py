"""Experiment framework tests: scaffolder, launcher, CLI plumbing
(mirrors the waf --create / --local workflow, waf_tools/limbo.py)."""

import json
import os
import subprocess
import sys

from limbo_tpu.experiment import create_exp, generate_job_scripts, load_conf, run_local


def test_create_exp(tmp_path):
    d = create_exp("myexp", base_dir=str(tmp_path), dim_in=3, iterations=7,
                   samples=4)
    assert os.path.exists(os.path.join(d, "myexp.py"))
    conf = json.load(open(os.path.join(d, "conf.json")))
    assert conf["exps"] == ["myexp"]
    src = open(os.path.join(d, "myexp.py")).read()
    assert "DIM_IN = 3" in src and "MaxIterations(7)" in src


def test_run_local_replicates(tmp_path):
    """Launcher plumbing with a minimal experiment script (a full generated
    experiment run is exercised separately/on TPU — subprocess jax compiles
    are too slow for unit tests)."""
    d = tmp_path / "exp" / "quick"
    d.mkdir(parents=True)
    (d / "quick.py").write_text(
        "import os, sys\n"
        "rep = sys.argv[1]\n"
        "assert os.environ['LIMBO_TPU_REPLICATE'] == rep\n"
        "import limbo_tpu.config  # pkg importable via launcher PYTHONPATH\n"
        "open(f'replicate_{rep}.out', 'w').write('ok')\n")
    conf = {"exps": ["quick"], "nb_runs": 2,
            "res_dir": str(tmp_path / "results"), "bin_dir": str(d),
            "wall_time": "0:10:00"}
    codes = run_local(conf)
    assert codes == [0, 0]
    logs = os.listdir(conf["res_dir"])
    assert any(l.endswith(".log") for l in logs)
    assert (tmp_path / "results" / "replicate_0.out").exists()
    assert (tmp_path / "results" / "replicate_1.out").exists()


def test_run_local_shared_compile_cache(tmp_path):
    """Every replicate sees the same persistent XLA compile-cache dir
    (replicate 0 compiles, the rest deserialize); conf opt-out respected."""
    d = tmp_path / "exp" / "cachey"
    d.mkdir(parents=True)
    (d / "cachey.py").write_text(
        "import os, sys\n"
        "open(f'cache_{sys.argv[1]}.out', 'w').write(\n"
        "    os.environ.get('JAX_COMPILATION_CACHE_DIR', ''))\n")
    conf = {"exps": ["cachey"], "nb_runs": 2,
            "res_dir": str(tmp_path / "results"), "bin_dir": str(d)}
    assert run_local(conf) == [0, 0]
    seen = {open(tmp_path / "results" / f"cache_{r}.out").read()
            for r in range(2)}
    assert seen == {str(tmp_path / "results" / ".jax_cache")}

    conf = {"exps": ["cachey"], "nb_runs": 1, "compile_cache": False,
            "res_dir": str(tmp_path / "results2"), "bin_dir": str(d)}
    env_cache = os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    try:
        assert run_local(conf) == [0]
    finally:
        if env_cache is not None:
            os.environ["JAX_COMPILATION_CACHE_DIR"] = env_cache
    assert open(tmp_path / "results2" / "cache_0.out").read() == ""


def test_generate_job_scripts(tmp_path):
    d = create_exp("jobexp", base_dir=str(tmp_path / "exp"))
    conf = load_conf(os.path.join(d, "conf.json"))
    conf["nb_runs"] = 3
    conf["res_dir"] = str(tmp_path / "jobs")
    conf["bin_dir"] = d
    paths = generate_job_scripts(conf)
    assert len(paths) == 3
    body = open(paths[0]).read()
    assert "SBATCH" in body and "jobexp" in body


def test_cli_params(capsys):
    from limbo_tpu.cli import main

    main(["params", "--acqui_ucb.alpha=0.9"])
    out = capsys.readouterr().out
    assert "acqui_ucb.alpha = 0.9" in out
