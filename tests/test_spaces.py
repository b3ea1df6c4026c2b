import jax
import jax.numpy as jnp
import numpy as np

from pearl_tpu.api.spaces import BoxActionSpace, BoxSpace, DiscreteActionSpace, DiscreteSpace


def test_discrete_space_create_and_sample():
    space = DiscreteSpace.range(5)
    assert space.n == 5
    assert space.element_dim == 1
    assert not space.is_continuous
    key = jax.random.PRNGKey(0)
    idx = space.sample_index(key)
    assert 0 <= int(idx) < 5
    el = space.sample(key)
    assert el.shape == (1,)


def test_discrete_space_masked_sample():
    space = DiscreteActionSpace.discrete(4)
    mask = jnp.array([False, False, True, False])
    for i in range(20):
        idx = space.sample_index(jax.random.PRNGKey(i), mask)
        assert int(idx) == 2


def test_discrete_action_space_batch():
    space = DiscreteActionSpace.discrete(3)
    assert space.actions_batch.shape == (3, 1)
    assert space.action_dim == 1


def test_box_space_sample_in_bounds():
    space = BoxActionSpace.create([-2.0, 0.0], [2.0, 1.0])
    assert space.is_continuous
    assert space.action_dim == 2
    for i in range(10):
        x = space.sample(jax.random.PRNGKey(i))
        assert np.all(np.asarray(x) >= np.asarray(space.low) - 1e-6)
        assert np.all(np.asarray(x) <= np.asarray(space.high) + 1e-6)


def test_box_space_clip():
    space = BoxSpace.create(-1.0, 1.0)
    assert float(space.clip(jnp.array([3.0]))[0]) == 1.0
