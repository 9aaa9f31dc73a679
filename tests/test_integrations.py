"""ROS adapter tests (limbo_tpu/integrations/ros.py) with a fake transport.

Parity target: the reference's ROS glue (package.xml REP-136 metadata +
src/tutorials/ros.py waf shim) lets a limbo experiment call a robot from
its objective functor; here the adapter marshals candidates/observations
between device arrays and message-style objects and feeds the standard
NaN-guard (bo_base.hpp:232-238).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.bo import BOptimizer
from limbo_tpu.bo.optimizer import EvaluationError
from limbo_tpu.bo.stop import MaxIterations
from limbo_tpu.bo.init_designs import RandomSampling
from limbo_tpu.integrations import RosObjective, make_ros_objective


class FakeResponse:
    def __init__(self, rewards):
        self.rewards = rewards


def test_marshalling_roundtrip():
    seen = []

    def transport(req):
        seen.append(req)
        assert isinstance(req, list) and all(isinstance(v, float)
                                             for v in req)
        return FakeResponse([sum(req)])

    f = make_ros_objective(transport, dim_out=1)
    y = f(jnp.asarray([0.25, 0.75]))
    assert y.shape == (1,)
    np.testing.assert_allclose(float(y[0]), 1.0, atol=1e-6)
    assert seen == [[0.25, 0.75]]


def test_scalar_and_sequence_responses():
    assert float(make_ros_objective(lambda r: 2.5)(jnp.zeros(2))[0]) == 2.5
    y = make_ros_objective(lambda r: (1.0, 2.0), dim_out=2)(jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(y), [1.0, 2.0])


def test_invalid_responses_raise_evaluation_error():
    with pytest.raises(EvaluationError):
        make_ros_objective(lambda r: float("nan"))(jnp.zeros(2))
    with pytest.raises(EvaluationError):
        make_ros_objective(lambda r: [1.0, 2.0], dim_out=1)(jnp.zeros(2))
    with pytest.raises(EvaluationError):
        make_ros_objective(lambda r: None)(jnp.zeros(2))


def test_transport_retry_then_success():
    calls = {"n": 0}

    def flaky(req):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("service restarting")
        return [0.5]

    naps = []
    f = RosObjective(flaky, dim_out=1, retries=3, retry_wait_s=0.01,
                     sleeper=naps.append)
    assert float(f(jnp.zeros(1))[0]) == 0.5
    assert calls["n"] == 3 and len(naps) == 2

    def down(req):
        raise ConnectionError("no service")

    with pytest.raises(EvaluationError, match="after 2 attempts"):
        RosObjective(down, retries=1, sleeper=naps.append)(jnp.zeros(1))


def test_bo_loop_through_ros_adapter():
    """End-to-end: BOptimizer drives a fake robot service and finds the
    optimum of -(x - 0.6)^2 (examples/mono_dim-style loop over ROS)."""

    def robot_service(req):
        x = np.asarray(req)
        return FakeResponse([float(-np.sum((x - 0.6) ** 2))])

    f = make_ros_objective(robot_service, dim_out=1)
    bo = BOptimizer(init=RandomSampling(8), stop=(MaxIterations(25),),
                    stats_enabled=False)
    state = bo.optimize(f, dim_in=2, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(state.best_sample), [0.6, 0.6],
                               atol=0.15)
    assert f.n_calls >= 33
