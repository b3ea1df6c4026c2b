"""PearlAgent: the composition of policy learner + safety module + history
summarization + replay buffer (reference: pearl/pearl_agent.py:43-332).

Differences from the reference, by design (SURVEY.md §7):
- All agent functions are pure and batched over `num_envs` on-device env
  instances; `AgentState` is one pytree carrying every module's state.
- `observe` pushes *history summaries* (stored windows), exactly like the
  reference (pearl_agent.py:185-206) — the replay buffer never sees raw
  observations when a history module is configured.
- Dynamic action spaces are a fixed candidate set + availability mask updated
  from each step's `ActionResult` (replacing the reference's per-step action
  space swap, pearl_agent.py:208-212).
- `learn` clears the buffer for on-policy learners (pearl_agent.py:219-220).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pearl_tpu.api.types import ActionResult, PRNGKey
from pearl_tpu.policy_learners.policy_learner import ActionChoice, PolicyLearner
from pearl_tpu.replay_buffers.replay_buffer import BasicReplayBuffer
from pearl_tpu.replay_buffers.transition import TransitionBatch
from pearl_tpu.safety_modules import IdentitySafetyModule, SafetyModule
from pearl_tpu.utils.pytree import tree_select


@struct.dataclass
class AgentState:
    learner: Any
    safety: Any
    replay: Any
    history_carry: Any
    available_mask: Optional[jnp.ndarray]  # (B, A) current availability
    last_action: ActionChoice


@dataclasses.dataclass(frozen=True, eq=False)
class PearlAgent:
    policy_learner: PolicyLearner
    replay_buffer: BasicReplayBuffer = dataclasses.field(
        default_factory=lambda: BasicReplayBuffer(capacity=10_000)
    )
    safety_module: SafetyModule = dataclasses.field(default_factory=IdentitySafetyModule)
    track_available_masks: bool = False  # store (B, A) masks in replay
    store_cost: bool = False

    def __post_init__(self):
        """Compatibility check + safety-module injection (reference:
        pearl/pearl_agent.py:84-97, pearl/utils/compatibility_checks.py:19-31).

        A distributional policy learner acts under a risk metric, so the
        agent-level safety module must reach it: a risk-sensitive module
        passed to the agent is injected into the learner's `safety` field;
        the untouched default resolves to the learner's own (risk-neutral by
        default) module so both views agree; anything else is a TypeError —
        never a silently ignored config point."""
        from pearl_tpu.safety_modules.risk_sensitive import RiskSensitiveSafetyModule

        learner = self.policy_learner
        if learner.is_distributional and hasattr(learner, "safety"):
            if isinstance(self.safety_module, RiskSensitiveSafetyModule):
                object.__setattr__(
                    self,
                    "policy_learner",
                    dataclasses.replace(learner, safety=self.safety_module),
                )
            elif type(self.safety_module) is IdentitySafetyModule:
                # Default left in place: mirror the reference's
                # default_risk_sensitive_safety_module_type resolution.
                object.__setattr__(self, "safety_module", learner.safety)
            else:
                raise TypeError(
                    "A distributional policy learner requires a risk-sensitive "
                    "safety module (reference compatibility_checks.py:19-31); "
                    f"got {type(self.safety_module).__name__}."
                )

    @property
    def _frame_path(self) -> bool:
        """Visual fast path: a FrameRingHistorySummarization paired with a
        frame-push replay buffer — observe hands single frames to the ring
        (never materializing the stacked windows) and the CNN act path reads
        the circular window in place (frame_ring.py module docstring)."""
        summ = self.policy_learner.history_summarizer
        if not getattr(summ, "is_frame_ring", False):
            return False
        if not getattr(self.replay_buffer, "supports_frame_push", False):
            raise TypeError(
                "FrameRingHistorySummarization requires a frame-push replay "
                "buffer (VisualReplayBuffer): the generic path would "
                "materialize the stacked window every step, which is the "
                f"traffic the ring eliminates. Got "
                f"{type(self.replay_buffer).__name__}."
            )
        net = getattr(self.policy_learner, "q_network", None)
        if not getattr(net, "supports_frame_ring", False):
            raise TypeError(
                "FrameRingHistorySummarization requires a ring-aware "
                "q-network (CNNQValueNetwork(time_major_stack=True)): other "
                "nets cannot consume the circular FrameRingView the ring "
                f"hands them. Got {type(net).__name__}."
            )
        return True

    @property
    def _cache_net(self):
        """The ring-aware CNN when the conv1-cache act path is enabled
        (q_value_networks.CNNQValueNetwork.conv1_cache + ops/conv_cache.py),
        else None. The agent owns the cache lifecycle: seed at init, one
        slab write per observe, full refresh after every weight update."""
        if not self._frame_path:
            return None
        net = self.policy_learner.q_network
        return net if getattr(net, "cache_enabled", False) else None

    # ------------------------------------------------------------------ setup
    def for_env(self, env) -> "PearlAgent":
        """Bind the learner to the env's action space (must be called before
        init/act/learn)."""
        return dataclasses.replace(
            self, policy_learner=self.policy_learner.bind(env.action_space)
        )

    @property
    def _summ(self):
        return self.policy_learner.history_summarizer

    def _rep_dims(self, observation_dim: int):
        learner = self.policy_learner
        space = learner.action_space
        num_actions = getattr(space, "n", 0)
        rep = learner.resolved_action_representation(space)
        rep_dim = rep.representation_dim(space.action_dim, num_actions)
        return rep, rep_dim, num_actions

    def init(
        self, key: PRNGKey, observation_dim: int, num_envs: int, initial_obs: jnp.ndarray
    ) -> AgentState:
        learner = self.policy_learner
        space = learner.action_space
        rep, rep_dim, num_actions = self._rep_dims(observation_dim)
        k_l, k_s = jax.random.split(key)
        learner_state = learner.init(k_l, observation_dim, space, num_envs)
        safety_state = self.safety_module.init(k_s, observation_dim, space, num_envs)

        carry = self._summ.init_carry(num_envs, observation_dim, rep_dim)
        carry = self._summ.observe(carry, initial_obs, None)
        net = self._cache_net
        if net is not None:
            carry = carry.replace(
                cache=net.refresh_cache(learner_state.params, carry)
            )

        stored_dim = self._summ.stored_dim(observation_dim, rep_dim)
        action_dim = space.action_dim
        example = TransitionBatch(
            state=jnp.zeros((1, stored_dim)),
            action=jnp.zeros((1, action_dim)),
            reward=jnp.zeros((1,)),
            next_state=jnp.zeros((1, stored_dim)),
            terminated=jnp.zeros((1,), jnp.bool_),
            truncated=jnp.zeros((1,), jnp.bool_),
            action_index=jnp.zeros((1,), jnp.int32),
            curr_available_mask=(
                jnp.zeros((1, num_actions), jnp.bool_)
                if self.track_available_masks and num_actions
                else None
            ),
            next_available_mask=(
                jnp.zeros((1, num_actions), jnp.bool_)
                if self.track_available_masks and num_actions
                else None
            ),
            cost=jnp.zeros((1,)) if self.store_cost else None,
            **self._extra_example_fields(num_envs, space),
        )
        replay_state = self.replay_buffer.init(example)

        mask = (
            jnp.ones((num_envs, num_actions), jnp.bool_) if num_actions else None
        )
        last = ActionChoice(
            action=jnp.zeros((num_envs, action_dim)),
            index=jnp.zeros((num_envs,), jnp.int32),
        )
        return AgentState(
            learner=learner_state,
            safety=safety_state,
            replay=replay_state,
            history_carry=carry,
            available_mask=mask,
            last_action=last,
        )

    def _extra_example_fields(self, num_envs, space):
        """Buffer-specific extra transition fields (bootstrap masks, SARSA
        next-action, ...) — resolved from the replay buffer config."""
        extra = {}
        if hasattr(self.replay_buffer, "extra_example_fields"):
            extra = self.replay_buffer.extra_example_fields(space)
        return extra

    # ------------------------------------------------------------------- act
    def subjective_state(self, astate: AgentState) -> jnp.ndarray:
        stored = self._summ.stored(astate.history_carry)
        return self._summ.forward(astate.learner.summarizer_params, stored)

    def act(
        self, astate: AgentState, key: PRNGKey, exploit: bool = False
    ) -> Tuple[AgentState, ActionChoice]:
        subjective = self.subjective_state(astate)
        mask = self.safety_module.filter_action(
            astate.safety, subjective, astate.available_mask
        )
        learner_state, choice = self.policy_learner.act(
            astate.learner, subjective, mask, key, exploit
        )
        return astate.replace(learner=learner_state, last_action=choice), choice

    # --------------------------------------------------------------- observe
    def observe(
        self,
        astate: AgentState,
        result: ActionResult,
        next_obs: jnp.ndarray,
        key: PRNGKey,
    ) -> AgentState:
        """Ingest a batched env step: update history, push the transition,
        reset per-env state where episodes ended."""
        if self._frame_path:
            return self._observe_frames(astate, result, next_obs, key)
        astate, transition, k_push = self.observe_deferred(
            astate, result, next_obs, key
        )
        replay_state = self.replay_buffer.push(astate.replay, transition, k_push)
        return astate.replace(replay=replay_state)

    def _observe_frames(
        self,
        astate: AgentState,
        result: ActionResult,
        next_obs: jnp.ndarray,
        key: PRNGKey,
    ) -> AgentState:
        """Frame-ring observe: the whole step's history+replay traffic is two
        single frames (the acting observation read from the ring, the
        post-step observation from the env) plus one ring slab write —
        O(frame) instead of O(window) per step."""
        summ = self._summ
        learner = self.policy_learner
        k_push, k_reset = jax.random.split(key)
        done = result.done

        frame_s = summ.newest_frame(astate.history_carry)
        frame_n = result.observation
        frame_n_fb = None
        from pearl_tpu.ops.layout_fence import copy_fence, use_push_fence
        from pearl_tpu.ops.ring_write import use_ring_write

        if use_push_fence() and jax.default_backend() == "tpu":
            # Layout-cycle breaker (bit-exact identity): without it the ring
            # carry and the replay frame ring pin each other batch/column-
            # minor through this push even when the convs are fenced off the
            # carry (ops/layout_fence.py `copy_fence` docstring).
            frame_s = copy_fence(frame_s)
        if (
            use_ring_write()
            and jax.default_backend() == "tpu"
            and getattr(self.replay_buffer, "dedup_next", False)
        ):
            # Hand the post-step frame over in its natural (F, B) storage
            # order; the side ring transposes it inside its rare cond branch
            # (VisualReplayBuffer.push_frames docstring).
            frame_n, frame_n_fb = None, result.observation.T
        carry_next = summ.advance(
            astate.history_carry, result.observation, next_obs, done
        )
        net = self._cache_net
        if net is not None:
            from pearl_tpu.ops.conv_cache import cache_write

            ring_dt = astate.history_carry.ring.dtype
            # Same select as the ring entry inside advance() (CSE'd by XLA):
            # done envs restart with the reset observation.
            entry_fb = jnp.where(
                done[None, :], next_obs.T, result.observation.T
            ).astype(ring_dt)
            y = net.cache_contrib_y(astate.learner.params, entry_fb)
            T, _, _, _, _, _, _, OC = net._conv1_dims()
            carry_next = carry_next.replace(
                cache=cache_write(
                    astate.history_carry.cache, y,
                    astate.history_carry.cursor, T=T, OC=OC,
                )
            )
        rest = TransitionBatch(
            state=None,
            action=astate.last_action.action,
            reward=result.reward,
            next_state=None,
            terminated=result.terminated,
            truncated=result.truncated,
            action_index=astate.last_action.index,
            curr_available_mask=(
                astate.available_mask if self.track_available_masks else None
            ),
            next_available_mask=(
                result.available_actions_mask
                if self.track_available_masks
                else None
            ),
            cost=(result.cost if self.store_cost else None),
        )
        replay_state = self.replay_buffer.push_frames(
            astate.replay, frame_s, frame_n, rest, k_push,
            frame_n_fb=frame_n_fb,
        )

        if astate.available_mask is not None:
            full = jnp.ones_like(astate.available_mask)
            next_mask = result.available_actions_mask
            new_mask = next_mask if next_mask is not None else full
            mask_next = jnp.where(done[:, None], full, new_mask)
        else:
            mask_next = None

        learner_state = learner.episode_reset(astate.learner, done, k_reset)
        return astate.replace(
            learner=learner_state,
            history_carry=carry_next,
            available_mask=mask_next,
            replay=replay_state,
        )

    def observe_deferred(
        self,
        astate: AgentState,
        result: ActionResult,
        next_obs: jnp.ndarray,
        key: PRNGKey,
    ):
        """`observe` WITHOUT the replay push: returns (astate', transition,
        push_key) so a scan-based driver can collect a whole chunk's
        transitions and write them to the ring in ONE contiguous push
        (`ReplayBuffer.supports_deferred_push`) — same ring layout, ~1/k the
        dynamic-write ops. RNG use is identical to `observe`, so act/env
        streams (and therefore learning curves) match the per-step path."""
        if self._frame_path:
            raise ValueError(
                "the frame-ring visual path pushes per step (frame "
                "reconstruction needs one row per env per push); deferred "
                "pushes are not supported"
            )
        summ = self._summ
        learner = self.policy_learner
        space = learner.action_space
        rep = learner.resolved_action_representation(space)

        prev_stored = summ.stored(astate.history_carry)
        act_rep = rep.apply(astate.last_action.action)
        carry_after = summ.observe(astate.history_carry, result.observation, act_rep)
        next_stored = summ.stored(carry_after)

        done = result.done
        num_envs = done.shape[0]

        next_mask = result.available_actions_mask
        transition = TransitionBatch(
            state=prev_stored,
            action=astate.last_action.action,
            reward=result.reward,
            next_state=next_stored,
            terminated=result.terminated,
            truncated=result.truncated,
            action_index=astate.last_action.index,
            curr_available_mask=(
                astate.available_mask if self.track_available_masks else None
            ),
            next_available_mask=(next_mask if self.track_available_masks else None),
            cost=(result.cost if self.store_cost else None),
        )
        k_push, k_reset = jax.random.split(key)

        # Asynchronous per-env episode resets: zero the window and seed it with
        # the post-reset observation.
        zeroed = summ.reset_envs(carry_after, done)
        fresh = summ.observe(zeroed, next_obs, None)
        carry_next = tree_select(done, fresh, carry_after)

        if astate.available_mask is not None:
            full = jnp.ones_like(astate.available_mask)
            new_mask = next_mask if next_mask is not None else full
            mask_next = jnp.where(done[:, None], full, new_mask)
        else:
            mask_next = None

        learner_state = learner.episode_reset(astate.learner, done, k_reset)
        return (
            astate.replace(
                learner=learner_state,
                history_carry=carry_next,
                available_mask=mask_next,
            ),
            transition,
            k_push,
        )

    # ----------------------------------------------------------------- learn
    def learn(self, astate: AgentState, key: PRNGKey) -> Tuple[AgentState, dict]:
        k_l, k_s = jax.random.split(key)
        batch_transform = None
        if hasattr(self.safety_module, "batch_transform"):
            batch_transform = self.safety_module.batch_transform(astate.safety)
        learner_state, replay_state, metrics = self.policy_learner.learn(
            astate.learner,
            self.replay_buffer,
            astate.replay,
            k_l,
            **({"batch_transform": batch_transform} if batch_transform else {}),
        )
        safety_state = astate.safety
        if hasattr(self.safety_module, "learn"):
            safety_state, s_metrics = self.safety_module.learn(
                safety_state,
                self.replay_buffer,
                astate.replay,
                k_s,
                self.policy_learner,
                learner_state,
            )
            metrics = {**metrics, **s_metrics}
        if self.policy_learner.on_policy:
            replay_state = self.replay_buffer.clear(replay_state)
        astate = astate.replace(
            learner=learner_state, safety=safety_state, replay=replay_state
        )
        net = self._cache_net
        if net is not None:
            # conv1 weights just moved: recompute every cached contribution
            # so the act path stays exact (ops/conv_cache.py docstring).
            astate = astate.replace(
                history_carry=astate.history_carry.replace(
                    cache=net.refresh_cache(
                        learner_state.params, astate.history_carry
                    )
                )
            )
        return (astate, metrics)

    def learn_batch(self, astate: AgentState, batch: TransitionBatch):
        """Offline path (reference pearl_agent.py:224-233): safety batch
        transform (e.g. RC's reward - lambda*cost) -> learner preprocess ->
        learner update -> safety update (the RC module trains its cost critic
        and lambda from the same batch, using the learner's current policy)."""
        if hasattr(self.safety_module, "batch_transform"):
            batch = self.safety_module.batch_transform(astate.safety)(batch)
        learner_batch = self.policy_learner.preprocess_batch(astate.learner, batch)
        learner_state, metrics = self.policy_learner.learn_batch(
            astate.learner, learner_batch
        )
        safety_state, s_metrics = self.safety_module.learn_batch(
            astate.safety,
            batch,
            learner=self.policy_learner,
            learner_state=learner_state,
        )
        return astate.replace(learner=learner_state, safety=safety_state), {
            **metrics,
            **s_metrics,
        }
