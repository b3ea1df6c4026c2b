"""Actor-critic base (reference:
pearl/policy_learners/sequential_decision_making/actor_critic_base.py:67-431).

Semantics preserved:
- Separate actor / critic / history-summarizer optimizers with their own
  learning rates (:67-226). In JAX the "retain_graph" dance becomes: actor
  grads w.r.t. actor params, critic grads w.r.t. critic params, and the
  summarizer receives the SUM of both losses' gradients (:312-369).
- Optional deep-copied actor/critic targets, soft-updated with tau after each
  learn_batch (:341-369).
- `act`: discrete = exploration over the policy distribution; continuous =
  sample from the policy (exploit = mean/deterministic action) (:246-306).
- RC-safety cost preprocessing (reward -= lambda * cost) hooks in
  `preprocess_batch` (:371-386), wired when the agent's safety module is a
  RewardConstrainedSafetyModule.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pearl_tpu.neural_networks.actor_networks import VanillaActorNetwork
from pearl_tpu.neural_networks.twin_critic import TwinCritic
from pearl_tpu.policy_learners.exploration_modules.common import (
    ExplorationModule,
    PropensityExploration,
    masked_argmax,
)
from pearl_tpu.action_representation_modules import (
    ActionRepresentationModule,
    OneHotActionRepresentation,
)
from pearl_tpu.policy_learners.policy_learner import ActionChoice, PolicyLearner
from pearl_tpu.replay_buffers.transition import TransitionBatch


@struct.dataclass
class ActorCriticState:
    actor_params: Any
    critic_params: Any
    actor_target_params: Any  # None when unused
    critic_target_params: Any  # None when unused
    summarizer_params: Any
    actor_opt: Any
    critic_opt: Any
    summ_opt: Any
    explore_state: Any
    step: jnp.ndarray
    key: Any = None  # learner-internal RNG (policy sampling inside losses)
    extra: Any = None  # per-algorithm state (e.g. SAC log_alpha)


@dataclasses.dataclass(frozen=True, kw_only=True, eq=False)
class ActorCriticBase(PolicyLearner):
    actor_network: Any = VanillaActorNetwork()
    critic_network: Any = TwinCritic()
    exploration: ExplorationModule = PropensityExploration()
    action_representation: ActionRepresentationModule = OneHotActionRepresentation()
    actor_learning_rate: float = 1e-3
    critic_learning_rate: float = 1e-3
    history_summarization_learning_rate: float = 1e-3
    discount_factor: float = 0.99
    actor_soft_update_tau: float = 0.005
    critic_soft_update_tau: float = 0.005
    actor_update_freq: int = 1  # TD3 delays actor updates
    training_rounds: int = 1
    batch_size: int = 256
    pmean_axis: Optional[str] = None
    # Act-path mixed precision (e.g. "bfloat16"), mirroring
    # DeepTDLearning.act_dtype: the acting forward is cast to this dtype
    # (params + subjective state), outputs return as f32; learning stays f32.
    # Opt-in throughput lever for large num_envs (docs/DESIGN.md §4).
    act_dtype: Optional[str] = None

    # Which pieces exist (mirrors the reference's constructor switches).
    @property
    def use_actor_target(self) -> bool:
        return False

    @property
    def use_critic_target(self) -> bool:
        return True

    @property
    def is_continuous(self) -> bool:
        return self.action_space is not None and self.action_space.is_continuous

    def actor_optimizer(self):
        return optax.adamw(self.actor_learning_rate, weight_decay=0.01)

    def critic_optimizer(self):
        return optax.adamw(self.critic_learning_rate, weight_decay=0.01)

    def summ_optimizer(self):
        return optax.adamw(self.history_summarization_learning_rate, weight_decay=0.01)

    # ------------------------------------------------------------------ init
    @property
    def actor(self):
        """The actor network, with continuous-space default substitution."""
        return self._resolved_actor()

    def _resolved_actor(self):
        """Swap the discrete softmax default for a Gaussian actor when bound
        to a continuous space (the reference picks the actor class per
        algorithm; here the config default adapts to the space)."""
        if self.is_continuous and isinstance(self.actor_network, VanillaActorNetwork):
            from pearl_tpu.neural_networks.actor_networks import GaussianActorNetwork

            return GaussianActorNetwork(hidden_dims=self.actor_network.hidden_dims)
        return self.actor_network

    def _init_actor(self, key, subj_dim, rep_dim, num_actions):
        if self.is_continuous:
            return self._resolved_actor().init(
                key, subj_dim, self.action_space.action_dim
            )
        return self.actor.init(key, subj_dim, rep_dim, num_actions)

    def _init_critic(self, key, subj_dim, rep_dim):
        if self.critic_network is None:
            return None
        a_dim = self.action_space.action_dim if self.is_continuous else rep_dim
        if hasattr(self.critic_network, "q_both"):
            # Action-value (twin) critics — TwinCritic, CNNTwinCritic, ...
            return self.critic_network.init(key, subj_dim, a_dim)
        # State-value critic (PPO/REINFORCE).
        return self.critic_network.init(key, subj_dim)

    def init_extra(self, key):
        return None

    def init(self, key, observation_dim, action_space, num_envs):
        subj_dim, rep_dim, num_actions = self.dims(observation_dim, action_space)
        k_a, k_c, k_s, k_e = jax.random.split(key, 4)
        actor_params = self._init_actor(k_a, subj_dim, rep_dim, num_actions)
        critic_params = self._init_critic(k_c, subj_dim, rep_dim)
        summ_params = self.history_summarizer.init_params(k_s, observation_dim, rep_dim)
        return ActorCriticState(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_target_params=actor_params if self.use_actor_target else None,
            critic_target_params=critic_params if self.use_critic_target else None,
            summarizer_params=summ_params,
            actor_opt=self.actor_optimizer().init(actor_params),
            critic_opt=(
                self.critic_optimizer().init(critic_params)
                if critic_params is not None
                else None
            ),
            summ_opt=self.summ_optimizer().init(summ_params),
            explore_state=self.exploration.init(num_envs),
            step=jnp.zeros((), jnp.int32),
            key=jax.random.split(k_e)[0],
            extra=self.init_extra(k_e),
        )

    # ------------------------------------------------------------------- act
    def _exploit_action_continuous(self, actor_params, subjective_state, key):
        low, high = self.action_space.low, self.action_space.high
        if hasattr(self.actor, "mean_action"):
            return self.actor.mean_action(actor_params, subjective_state, low, high)
        return self.actor.action(actor_params, subjective_state, low, high)

    def _act_cast(self, state, subjective_state):
        """Apply `act_dtype` mixed precision to the acting forward's inputs."""
        actor_params = state.actor_params
        if self.act_dtype is not None:
            dt = jnp.dtype(self.act_dtype)
            actor_params = jax.tree.map(lambda x: x.astype(dt), actor_params)
            subjective_state = subjective_state.astype(dt)
        return actor_params, subjective_state

    def act(self, state, subjective_state, mask, key, exploit: bool = False):
        B = subjective_state.shape[0]
        actor_params, subjective_state = self._act_cast(state, subjective_state)
        if self.is_continuous:
            low, high = self.action_space.low, self.action_space.high
            if exploit:
                action = self._exploit_action_continuous(
                    actor_params, subjective_state, key
                )
                explore_state = state.explore_state
            elif hasattr(self.exploration, "act_continuous"):
                base = self.actor.action(
                    actor_params, subjective_state, low, high
                ) if hasattr(self.actor, "action") else self.actor.sample_action(
                    actor_params, subjective_state, key, low, high
                )[0]
                explore_state, action = self.exploration.act_continuous(
                    state.explore_state, base, low, high, key
                )
            else:
                action, _ = self.actor.sample_action(
                    actor_params, subjective_state, key, low, high
                )
                explore_state = state.explore_state
            action = action.astype(jnp.float32)
            # Placeholder index for continuous spaces, derived from `action`
            # (not a fresh constant) so it stays axis-varying under shard_map.
            index = (action[:, 0] * 0).astype(jnp.int32)
            return (
                state.replace(explore_state=explore_state),
                ActionChoice(action=action, index=index),
            )
        candidates = self.represented_candidates(B)
        if self.act_dtype is not None:
            candidates = candidates.astype(jnp.dtype(self.act_dtype))
        probs = self.actor.get_policy_distribution(
            actor_params, subjective_state, candidates, mask
        ).astype(jnp.float32)
        exploit_index = self.greedy_index(probs, mask, key)
        if exploit:
            index = exploit_index
            explore_state = state.explore_state
        else:
            explore_state, index = self.exploration.act(
                state.explore_state, probs, exploit_index, mask, key
            )
        action = self.action_space.elements[index]
        return (
            state.replace(explore_state=explore_state),
            ActionChoice(action=action, index=index),
        )

    # ----------------------------------------------------------- learn plumbing
    def actor_loss(self, state, actor_params, summ_params, batch, subj, key):
        raise NotImplementedError

    def critic_loss(
        self, state, critic_params, summ_params, batch, subj, next_subj, key
    ):
        raise NotImplementedError

    def learn_batch(self, state: ActorCriticState, batch: TransitionBatch):
        k_next, k_actor, k_critic = jax.random.split(state.key, 3)
        state = state.replace(key=k_next)

        def actor_loss_fn(actor_params, summ_params):
            subj = self.history_summarizer.forward(summ_params, batch.state)
            return self.actor_loss(state, actor_params, summ_params, batch, subj, k_actor)

        def critic_loss_fn(critic_params, summ_params):
            subj = self.history_summarizer.forward(summ_params, batch.state)
            next_subj = jax.lax.stop_gradient(
                self.history_summarizer.forward(summ_params, batch.next_state)
            )
            return self.critic_loss(
                state, critic_params, summ_params, batch, subj, next_subj, k_critic
            )

        a_loss, (a_grads, a_summ_grads) = jax.value_and_grad(
            actor_loss_fn, argnums=(0, 1)
        )(state.actor_params, state.summarizer_params)
        if self.pmean_axis:
            a_grads, a_summ_grads = jax.lax.pmean(
                (a_grads, a_summ_grads), self.pmean_axis
            )
        step = state.step + 1
        # Delayed actor updates (TD3, td3.py:147-202): zero both grads and the
        # resulting update on frozen steps so neither momentum nor weight decay
        # moves the actor off-schedule.
        do_actor = (step % self.actor_update_freq) == 0
        gate = do_actor.astype(jnp.float32) if self.actor_update_freq > 1 else 1.0
        a_grads = jax.tree.map(lambda g: g * gate, a_grads)
        a_updates, actor_opt = self.actor_optimizer().update(
            a_grads, state.actor_opt, state.actor_params
        )
        a_updates = jax.tree.map(lambda u: u * gate, a_updates)
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        metrics = {"actor_loss": a_loss}
        summ_grads = a_summ_grads
        critic_params, critic_opt = state.critic_params, state.critic_opt
        if state.critic_params is not None:
            c_loss, (c_grads, c_summ_grads) = jax.value_and_grad(
                critic_loss_fn, argnums=(0, 1)
            )(state.critic_params, state.summarizer_params)
            if self.pmean_axis:
                c_grads, c_summ_grads = jax.lax.pmean(
                    (c_grads, c_summ_grads), self.pmean_axis
                )
            c_updates, critic_opt = self.critic_optimizer().update(
                c_grads, state.critic_opt, state.critic_params
            )
            critic_params = optax.apply_updates(state.critic_params, c_updates)
            summ_grads = jax.tree.map(jnp.add, summ_grads, c_summ_grads)
            metrics["critic_loss"] = c_loss

        s_updates, summ_opt = self.summ_optimizer().update(
            summ_grads, state.summ_opt, state.summarizer_params
        )
        summ_params = optax.apply_updates(state.summarizer_params, s_updates)

        actor_target = state.actor_target_params
        if actor_target is not None:
            actor_target = jax.tree.map(
                lambda t, s: jnp.where(
                    do_actor, t + self.actor_soft_update_tau * (s - t), t
                ),
                actor_target,
                actor_params,
            )
        critic_target = state.critic_target_params
        if critic_target is not None:
            critic_target = jax.tree.map(
                lambda t, s: t + self.critic_soft_update_tau * (s - t),
                critic_target,
                critic_params,
            )

        new_state = state.replace(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_target_params=actor_target,
            critic_target_params=critic_target,
            summarizer_params=summ_params,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            summ_opt=summ_opt,
            step=step,
        )
        new_state, extra_metrics = self.post_update(new_state, batch)
        return new_state, {**metrics, **extra_metrics}

    def post_update(self, state, batch):
        """Hook for per-update extra state (e.g. SAC temperature tuning)."""
        return state, {}

    def episode_reset(self, state, done_mask, key):
        return state.replace(
            explore_state=self.exploration.reset(state.explore_state, done_mask, key)
        )
