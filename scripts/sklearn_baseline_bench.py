"""Run the sklearn external GP baseline over the regression protocol.

Regenerates the exact datasets the committed regression suite used (same
PRNG keys — threefry is backend-deterministic) and measures scikit-learn's
GaussianProcessRegressor on each config, writing
`regression_results/sklearn_baseline.json` with vs-columns against the
committed TPU numbers in `regression_results/summary.json`.

Usage: python scripts/sklearn_baseline_bench.py [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # data gen only; keep TPU free

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from limbo_tpu.benchmarks import sklearn_baseline  # noqa: E402
from limbo_tpu.benchmarks.regression_functions import ALL_REGRESSION  # noqa: E402
from limbo_tpu.benchmarks.regression_suite import (  # noqa: E402
    DEFAULT_MODELS,
    _make_runner,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--points", type=int, nargs="*",
                    default=[50, 100, 200, 400, 600])
    ap.add_argument("--out", default="regression_results")
    args = ap.parse_args()

    summary_path = os.path.join(args.out, "summary.json")
    tpu = json.load(open(summary_path)) if os.path.exists(summary_path) else {}

    results = {}
    for fn in ALL_REGRESSION:
        for dim in fn.dims:
            for n in args.points:
                for spec in DEFAULT_MODELS:
                    make_data, _, _ = _make_runner(fn, dim, n, spec)
                    mses, t_l, t_q = [], [], []
                    for rep in range(args.reps):
                        key = jax.random.PRNGKey(rep * 97 + 13)
                        kd, _ = jax.random.split(key)
                        U, Y, Uq, Yq = make_data(kd)
                        m, tl, tq = sklearn_baseline.fit_and_eval(
                            np.asarray(U), np.asarray(Y), np.asarray(Uq),
                            np.asarray(Yq),
                            optimize_noise=spec.optimize_noise)
                        mses.append(m)
                        t_l.append(tl)
                        t_q.append(tq)
                    tag = f"{fn.name}_d{dim}_n{n}_{spec.name}"
                    row = {"sklearn_mse": float(np.median(mses)),
                           "sklearn_learn_ms": float(np.median(t_l)) * 1e3,
                           "sklearn_query_ms": float(np.median(t_q)) * 1e3}
                    if tag in tpu:
                        row["tpu_mse"] = tpu[tag]["mse"]
                        row["vs_sklearn_learn"] = (
                            row["sklearn_learn_ms"]
                            / max(tpu[tag]["learn_ms"], 1e-9))
                        row["vs_sklearn_query"] = (
                            row["sklearn_query_ms"]
                            / max(tpu[tag]["query_ms"], 1e-9))
                    results[tag] = row
                    extra = (f" | {row.get('vs_sklearn_learn', 0):.1f}x learn "
                             f"{row.get('vs_sklearn_query', 0):.1f}x query"
                             if tag in tpu else "")
                    print(f"{tag:50s} sk_mse={row['sklearn_mse']:.5f} "
                          f"learn={row['sklearn_learn_ms']:.0f}ms "
                          f"query={row['sklearn_query_ms']:.1f}ms{extra}",
                          flush=True)

    out_path = os.path.join(args.out, "sklearn_baseline.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path} ({len(results)} configs)")


if __name__ == "__main__":
    main()
