from limbo_tpu.acqui.acqui import EI, GP_UCB, UCB, DistanceToTarget, FirstElem, MeanAggregator

__all__ = ["UCB", "GP_UCB", "EI", "FirstElem", "MeanAggregator", "DistanceToTarget"]
