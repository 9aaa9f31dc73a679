"""IMGPO example (mirrors src/examples/experimental/imgpo.cpp)."""

import numpy as np

from limbo_tpu.bo.imgpo import IMGPO


def f(x):
    x = np.asarray(x)
    return -np.sum((x - 0.35) ** 2) + np.prod(np.cos(3 * x)) * 0.1


def main():
    opt = IMGPO(max_evals=60)
    opt.optimize(f, dim=2)
    print("best:", opt.best_sample, "->", opt.best_value)


if __name__ == "__main__":
    main()
