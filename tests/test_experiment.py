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
    d = create_exp("quick", base_dir=str(tmp_path / "exp"), dim_in=1,
                   iterations=2, samples=3)
    conf = load_conf(os.path.join(d, "conf.json"))
    conf["nb_runs"] = 2
    conf["res_dir"] = str(tmp_path / "results")
    conf["bin_dir"] = d
    codes = run_local(conf)
    assert codes == [0, 0]
    logs = os.listdir(conf["res_dir"])
    assert any(l.endswith(".log") for l in logs)
    # each replicate made its own hostname_date_pid result dir with stats
    res_dirs = [l for l in logs if not l.endswith(".log")]
    assert len(res_dirs) >= 1


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
