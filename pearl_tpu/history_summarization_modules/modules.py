"""History summarization modules (reference: pearl/history_summarization_modules/).

Semantics preserved from the reference agent loop (pearl_agent.py:171-213 and
policy_learner.py:198-219): the replay buffer stores the *raw history window*
(observation ++ previous-action-representation pairs), and learned summarizers
(LSTM/transformer) re-run their forward over the stored windows during
`preprocess_batch` so gradients flow into the summarizer from the policy loss
(state with grad, next_state without).

Functional protocol (batched over B envs):

    init_params(key) -> params            ({} for parameterless summarizers)
    init_carry(num_envs) -> HistoryState  (the rolling window per env)
    observe(carry, obs, action_repr) -> carry'        append one step
    reset_envs(carry, done_mask) -> carry'            zero windows of done envs
    stored(carry) -> (B, stored_dim)      flattened window pushed to replay
    forward(params, stored) -> (B, subjective_dim)    summary for networks
    subjective_dim(obs_dim, action_repr_dim) -> int
    stored_dim(obs_dim, action_repr_dim) -> int
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class HistorySummarizationModule(abc.ABC):
    def init_params(self, key, obs_dim: int, action_repr_dim: int):
        return {}

    @abc.abstractmethod
    def init_carry(self, num_envs: int, obs_dim: int, action_repr_dim: int):
        ...

    @abc.abstractmethod
    def observe(self, carry, obs, action_repr):
        ...

    @abc.abstractmethod
    def reset_envs(self, carry, done_mask):
        ...

    @abc.abstractmethod
    def stored(self, carry) -> jnp.ndarray:
        ...

    @abc.abstractmethod
    def forward(self, params, stored: jnp.ndarray) -> jnp.ndarray:
        ...

    @abc.abstractmethod
    def subjective_dim(self, obs_dim: int, action_repr_dim: int) -> int:
        ...

    def stored_dim(self, obs_dim: int, action_repr_dim: int) -> int:
        return self.subjective_dim(obs_dim, action_repr_dim)

    @property
    def has_params(self) -> bool:
        return False


@dataclasses.dataclass(frozen=True)
class IdentityHistorySummarization(HistorySummarizationModule):
    """Subjective state = latest observation (reference
    identity_history_summarization_module.py:22-70)."""

    def init_carry(self, num_envs, obs_dim, action_repr_dim):
        return jnp.zeros((num_envs, obs_dim))

    def observe(self, carry, obs, action_repr):
        del action_repr
        return obs

    def reset_envs(self, carry, done_mask):
        return carry  # next observe overwrites; nothing rolls over

    def stored(self, carry):
        return carry

    def forward(self, params, stored):
        return stored

    def subjective_dim(self, obs_dim, action_repr_dim):
        return obs_dim


@dataclasses.dataclass(frozen=True)
class StackingHistorySummarization(HistorySummarizationModule):
    """FIFO window of (action-repr, obs) pairs, flattened (reference
    stacking_history_summarization_module.py:22-117). Window is zero-padded at
    episode starts, matching the reference's zero-initialized buffer."""

    history_length: int = 8
    # include_action=False stacks OBSERVATIONS only (the Atari frame-stack
    # shape: window = T consecutive frames, no action interleaving) — pairs
    # with VisualReplayBuffer's frame-dedup storage and CNN nets'
    # time_major_stack. True is the reference's (action, obs)-pair behavior.
    include_action: bool = True

    def _entry_dim(self, obs_dim, action_repr_dim):
        return obs_dim + (action_repr_dim if self.include_action else 0)

    def init_carry(self, num_envs, obs_dim, action_repr_dim):
        return jnp.zeros(
            (num_envs, self.history_length, self._entry_dim(obs_dim, action_repr_dim))
        )

    def observe(self, carry, obs, action_repr):
        if self.include_action:
            if action_repr is None:
                action_repr = jnp.zeros(
                    obs.shape[:-1] + (carry.shape[-1] - obs.shape[-1],)
                )
            entry = jnp.concatenate([action_repr, obs], axis=-1)
        else:
            entry = obs
        return jnp.concatenate([carry[:, 1:], entry[:, None, :]], axis=1)

    def reset_envs(self, carry, done_mask):
        return jnp.where(done_mask[:, None, None], jnp.zeros_like(carry), carry)

    def stored(self, carry):
        return carry.reshape(carry.shape[0], -1)

    def forward(self, params, stored):
        return stored

    def subjective_dim(self, obs_dim, action_repr_dim):
        return self.history_length * self._entry_dim(obs_dim, action_repr_dim)


class _LSTMNet(nn.Module):
    hidden_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):  # (B, T, F) -> (B, hidden)
        # Inside shard_map, nn.RNN's default zero carry is unvarying over the
        # mesh axes while the scanned input varies — tripping shard_map's
        # varying-manual-axes consistency check (which we WANT enabled: it is
        # the compile-time guard for replication bugs). Promote the initial
        # carry to the input's varying axes explicitly.
        vma = ()
        try:
            vma = tuple(jax.typeof(x).vma)
        except Exception:
            pass
        for i in range(self.num_layers):
            cell = nn.LSTMCell(features=self.hidden_dim)
            lstm = nn.RNN(cell, name=f"lstm_{i}")
            if vma:
                carry = cell.initialize_carry(jax.random.key(0), x[:, 0].shape)
                carry = jax.lax.pcast(carry, vma, to="varying")
                x = lstm(x, initial_carry=carry)
            else:
                x = lstm(x)
        return x[:, -1, :]


@dataclasses.dataclass(frozen=True)
class LSTMHistorySummarization(HistorySummarizationModule):
    """LSTM over the history window; subjective state is the last output
    (reference lstm_history_summarization_module.py:22-146). The window (not
    the LSTM carry) is what replay stores, so `preprocess_batch` can re-run
    the LSTM with gradients, exactly like the reference's `forward`."""

    history_length: int = 8
    hidden_dim: int = 128
    num_layers: int = 2

    @property
    def has_params(self) -> bool:
        return True

    def _net(self):
        return _LSTMNet(self.hidden_dim, self.num_layers)

    def init_params(self, key, obs_dim, action_repr_dim):
        x0 = jnp.zeros((1, self.history_length, obs_dim + action_repr_dim))
        return self._net().init(key, x0)["params"]

    def init_carry(self, num_envs, obs_dim, action_repr_dim):
        return jnp.zeros((num_envs, self.history_length, obs_dim + action_repr_dim))

    def observe(self, carry, obs, action_repr):
        if action_repr is None:
            action_repr = jnp.zeros(obs.shape[:-1] + (carry.shape[-1] - obs.shape[-1],))
        entry = jnp.concatenate([action_repr, obs], axis=-1)
        return jnp.concatenate([carry[:, 1:], entry[:, None, :]], axis=1)

    def reset_envs(self, carry, done_mask):
        return jnp.where(done_mask[:, None, None], jnp.zeros_like(carry), carry)

    def stored(self, carry):
        return carry.reshape(carry.shape[0], -1)

    def forward(self, params, stored):
        B = stored.shape[0]
        x = stored.reshape(B, self.history_length, -1)
        return self._net().apply({"params": params}, x)

    def subjective_dim(self, obs_dim, action_repr_dim):
        return self.hidden_dim

    def stored_dim(self, obs_dim, action_repr_dim):
        return self.history_length * (obs_dim + action_repr_dim)


def _sinusoidal_positions(length: int, dim: int) -> jnp.ndarray:
    """Fixed sin/cos positional encodings (reference
    transformer_history_summarization_module.py:78-118, the
    positional_encoding="sinusoidal" option): PE[p, 2i] = sin(p / 10000^(2i/d)),
    PE[p, 2i+1] = cos(...)."""
    pos = jnp.arange(length)[:, None].astype(jnp.float32)
    div = jnp.exp(
        jnp.arange(0, dim, 2).astype(jnp.float32) * (-jnp.log(10000.0) / dim)
    )
    pe = jnp.zeros((length, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div[: dim // 2]))
    return pe[None]  # (1, T, dim)


class _TransformerNet(nn.Module):
    dim: int
    num_layers: int
    num_heads: int
    history_length: int
    positional_encoding: str = "learned"

    @nn.compact
    def __call__(self, x):  # (B, T, F) -> (B, dim)
        B, T, _ = x.shape
        x = nn.Dense(self.dim, name="embed")(x)
        if self.positional_encoding == "sinusoidal":
            pos = _sinusoidal_positions(self.history_length, self.dim)
        else:
            pos = self.param(
                "pos_embedding",
                nn.initializers.normal(0.02),
                (1, self.history_length, self.dim),
            )
        x = x + pos[:, :T]
        causal_mask = jnp.tril(jnp.ones((T, T), dtype=jnp.bool_))
        for i in range(self.num_layers):
            y = nn.LayerNorm(name=f"ln1_{i}")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f"attn_{i}"
            )(y, y, mask=causal_mask)
            x = x + y
            y = nn.LayerNorm(name=f"ln2_{i}")(x)
            y = nn.Dense(self.dim * 4, name=f"mlp1_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(self.dim, name=f"mlp2_{i}")(y)
            x = x + y
        return nn.LayerNorm(name="ln_f")(x)[:, -1, :]


@dataclasses.dataclass(frozen=True)
class TransformerHistorySummarization(HistorySummarizationModule):
    """Causal transformer over the window; last-token representation
    (reference transformer_history_summarization_module.py:78-314)."""

    history_length: int = 8
    dim: int = 64
    num_layers: int = 2
    num_heads: int = 4
    # "learned" (trainable embedding) or "sinusoidal" (fixed sin/cos) —
    # reference transformer_history_summarization_module.py:78-150.
    positional_encoding: str = "learned"

    @property
    def has_params(self) -> bool:
        return True

    def _net(self):
        if self.positional_encoding not in ("learned", "sinusoidal"):
            raise ValueError(
                "positional_encoding must be 'learned' or 'sinusoidal', got "
                f"{self.positional_encoding!r}"
            )
        return _TransformerNet(
            self.dim, self.num_layers, self.num_heads, self.history_length,
            self.positional_encoding,
        )

    def init_params(self, key, obs_dim, action_repr_dim):
        x0 = jnp.zeros((1, self.history_length, obs_dim + action_repr_dim))
        return self._net().init(key, x0)["params"]

    def init_carry(self, num_envs, obs_dim, action_repr_dim):
        return jnp.zeros((num_envs, self.history_length, obs_dim + action_repr_dim))

    observe = LSTMHistorySummarization.observe
    reset_envs = LSTMHistorySummarization.reset_envs
    stored = LSTMHistorySummarization.stored

    def forward(self, params, stored):
        B = stored.shape[0]
        x = stored.reshape(B, self.history_length, -1)
        return self._net().apply({"params": params}, x)

    def subjective_dim(self, obs_dim, action_repr_dim):
        return self.dim

    def stored_dim(self, obs_dim, action_repr_dim):
        return self.history_length * (obs_dim + action_repr_dim)
