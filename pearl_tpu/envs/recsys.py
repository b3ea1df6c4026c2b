"""Single-item recommender-system environment (reference tutorial:
tutorials/single_item_recommender_system_example + its unit-test twin
test/unit/test_tutorials/test_rec_system.py RecEnv).

The reference tutorial wraps a pre-trained torch LSTM click model over MIND
news embeddings: each step the agent picks one of `slate_size` randomly drawn
candidate items (a *dynamic action space*), the user model emits a Bernoulli
click, the clicked/shown item is appended to the user history, and episodes
reset every 20 steps. The agent sees only the click as its observation — the
informative state is the (action, click) history, which is exactly what the
LSTM history-summarization module recovers.

Here the same topology is a pure-JAX env vmappable over thousands of users:
the "pre-trained" user model is a fixed random two-layer MLP over
[mean(history embeddings), candidate embedding] (a stand-in for the torch
state dict, which cannot be shipped here), and the candidate slate is a fresh
availability mask over the fixed item catalog each step — the jit-static
version of the reference's per-step `available_action_space`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.environment import Environment
from pearl_tpu.api.spaces import BoxSpace, DiscreteActionSpace
from pearl_tpu.api.types import ActionResult, PRNGKey


@struct.dataclass
class RecSysState:
    history: jnp.ndarray  # (history_length, item_dim) recently shown items
    slate_mask: jnp.ndarray  # (num_items,) bool — current candidate slate
    last_click: jnp.ndarray  # f32
    t: jnp.ndarray  # i32


@dataclasses.dataclass(frozen=True, eq=False)
class RecommenderEnvironment(Environment):
    """Build with `RecommenderEnvironment.create(key, ...)`."""

    items: jnp.ndarray  # (num_items, item_dim) catalog embeddings
    w1: jnp.ndarray  # (2 * item_dim, hidden) user-model weights
    b1: jnp.ndarray  # (hidden,)
    w2: jnp.ndarray  # (hidden,)
    slate_size: int = 2
    episode_length: int = 20  # reference RecEnv: T = 20
    history_length: int = 8
    logit_scale: float = 3.0  # reference multiplies p by 3 "to speed up learning"

    @classmethod
    def create(
        cls,
        key: PRNGKey,
        *,
        num_items: int = 100,
        item_dim: int = 16,
        hidden: int = 32,
        slate_size: int = 2,
        episode_length: int = 20,
        history_length: int = 8,
    ) -> "RecommenderEnvironment":
        k_items, k_w1, k_w2 = jax.random.split(key, 3)
        return cls(
            items=jax.random.normal(k_items, (num_items, item_dim)),
            w1=jax.random.normal(k_w1, (2 * item_dim, hidden))
            / jnp.sqrt(2.0 * item_dim),
            b1=jnp.zeros((hidden,)),
            w2=jax.random.normal(k_w2, (hidden,)) / jnp.sqrt(hidden),
            slate_size=slate_size,
            episode_length=episode_length,
            history_length=history_length,
        )

    @property
    def num_items(self) -> int:
        return int(self.items.shape[0])

    @property
    def item_dim(self) -> int:
        return int(self.items.shape[1])

    @property
    def action_space(self) -> DiscreteActionSpace:
        # Actions ARE item embeddings (reference: DiscreteActionSpace over
        # 100-dim news vectors with IdentityActionRepresentationModule).
        return DiscreteActionSpace.create(self.items)

    @property
    def observation_space(self) -> BoxSpace:
        return BoxSpace.create(jnp.zeros((1,)), jnp.ones((1,)))

    @property
    def max_episode_steps(self) -> int:
        return self.episode_length

    def click_probability(
        self, history: jnp.ndarray, item: jnp.ndarray
    ) -> jnp.ndarray:
        """The frozen "pre-trained" user model: p(click | history, item)."""
        h = jnp.mean(history, axis=0)
        x = jnp.concatenate([h, item])
        z = jnp.tanh(x @ self.w1 + self.b1) @ self.w2
        return jax.nn.sigmoid(self.logit_scale * z)

    def _slate(self, key: PRNGKey) -> jnp.ndarray:
        idx = jax.random.choice(
            key, self.num_items, (self.slate_size,), replace=False
        )
        return jnp.zeros((self.num_items,), jnp.bool_).at[idx].set(True)

    def reset(self, key: PRNGKey) -> Tuple[RecSysState, jnp.ndarray]:
        state = RecSysState(
            history=jnp.zeros((self.history_length, self.item_dim)),
            slate_mask=self._slate(key),
            last_click=jnp.zeros(()),
            t=jnp.zeros((), jnp.int32),
        )
        return state, jnp.zeros((1,), jnp.float32)

    def step(
        self, state: RecSysState, action: jnp.ndarray, key: PRNGKey
    ) -> Tuple[RecSysState, ActionResult]:
        item = jnp.reshape(action, (self.item_dim,))
        k_click, k_slate = jax.random.split(key)
        p = self.click_probability(state.history, item)
        click = jax.random.bernoulli(k_click, p).astype(jnp.float32)

        history = jnp.concatenate([state.history[1:], item[None, :]], axis=0)
        t = state.t + 1
        new_state = RecSysState(
            history=history,
            slate_mask=self._slate(k_slate),
            last_click=click,
            t=t,
        )
        result = ActionResult(
            observation=click[None].astype(jnp.float32),
            reward=click,
            terminated=t >= self.episode_length,
            truncated=jnp.zeros((), jnp.bool_),
            available_actions_mask=new_state.slate_mask,
        )
        return new_state, result
