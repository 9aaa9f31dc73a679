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
