"""Q-value networks (reference: pearl/neural_networks/sequential_decision_making/q_value_networks.py).

Each network family is a frozen-dataclass *adapter* exposing a uniform
functional protocol that discrete-action learners are generic over:

    init(key, state_dim, action_dim, num_actions) -> params
    q_all(params, state, actions, mask) -> (B, A)

where `state` is (B, s), `actions` is the represented candidate-action tensor
(B, A, a) and `mask` is (B, A) availability (True = available). The Q for the
taken action is a `take_along_axis` gather on `q_all`'s output — there is no
separate single-action path, so every learner update is one big batched
matmul over (B*A) rows (MXU-friendly), mirroring the reference's
`extend_state_feature_by_available_action_space` trick but without the
per-step Python assembly.

Distributional (quantile) and ensemble networks extend the protocol:
    QuantileQValueNetwork.quantiles_all(params, state, actions) -> (B, A, N)
    EnsembleQValueNetwork.q_ensemble(params, state, actions) -> (B, K, A)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pearl_tpu.neural_networks.common import MLP, ConvNet, over_actions


class _PairQNet(nn.Module):
    """MLP over concat(state, action) -> (B, out)."""

    hidden_dims: Sequence[int]
    output_dim: int = 1
    use_layer_norm: bool = False

    @nn.compact
    def __call__(self, state, action):
        x = jnp.concatenate([state, action], axis=-1)
        return MLP(
            hidden_dims=self.hidden_dims,
            output_dim=self.output_dim,
            use_layer_norm=self.use_layer_norm,
        )(x)


@dataclasses.dataclass(frozen=True)
class VanillaQValueNetwork:
    """Q(s, a) via concat-MLP (reference q_value_networks.py:125-183)."""

    hidden_dims: Sequence[int] = (64, 64)
    use_layer_norm: bool = False

    def _module(self):
        return _PairQNet(hidden_dims=tuple(self.hidden_dims), use_layer_norm=self.use_layer_norm)

    def init(self, key, state_dim: int, action_dim: int, num_actions: int):
        del num_actions
        m = self._module()
        return m.init(key, jnp.zeros((1, state_dim)), jnp.zeros((1, action_dim)))["params"]

    def q_all(self, params, state, actions, mask=None):
        m = self._module()
        q = over_actions(
            lambda s, a: m.apply({"params": params}, s, a), state, actions
        )[..., 0]
        return q


class _MultiHeadNet(nn.Module):
    hidden_dims: Sequence[int]
    num_actions: int

    @nn.compact
    def __call__(self, state):
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=self.num_actions)(state)


@dataclasses.dataclass(frozen=True)
class MultiHeadQValueNetwork:
    """state -> one Q head per action (reference VanillaQValueMultiHeadNetwork,
    q_value_networks.py:186-250). Ignores the action representation; candidate
    order must match head order (true in the reference as well, which selects
    heads by one-hot bmm)."""

    hidden_dims: Sequence[int] = (64, 64)

    def init(self, key, state_dim: int, action_dim: int, num_actions: int):
        del action_dim
        m = _MultiHeadNet(tuple(self.hidden_dims), num_actions)
        return m.init(key, jnp.zeros((1, state_dim)))["params"]

    def q_all(self, params, state, actions, mask=None):
        # Optional fused Pallas path (PEARL_TPU_FUSED_MLP=1): the whole
        # relu-MLP chain in one VMEM-resident kernel. Off by default — for
        # THIS net's tiny dims XLA's native lowering is 5x faster (measured;
        # see pearl_tpu/ops/fused_mlp.py docstring for the numbers).
        from pearl_tpu.ops.fused_mlp import fused_mlp_from_flax, use_fused_mlp

        if use_fused_mlp():
            return fused_mlp_from_flax(params["MLP_0"], state)
        num_actions = actions.shape[1]
        m = _MultiHeadNet(tuple(self.hidden_dims), num_actions)
        return m.apply({"params": params}, state)


class _DuelingNet(nn.Module):
    """Dueling arch (reference DuelingQValueNetwork, q_value_networks.py:353-509):
    shared state trunk, value head V(s), advantage head A(s, a) per candidate,
    Q = V + A - mean_available(A)."""

    hidden_dims: Sequence[int]

    @nn.compact
    def __call__(self, state, actions, mask=None):
        B, A = actions.shape[0], actions.shape[1]
        feat = MLP(
            hidden_dims=tuple(self.hidden_dims[:-1]),
            output_dim=self.hidden_dims[-1],
            last_activation="relu",
            name="state_arch",
        )(state)
        value = MLP(hidden_dims=(self.hidden_dims[-1],), output_dim=1, name="value_arch")(
            feat
        )[..., 0]
        feat_rep = jnp.broadcast_to(feat[:, None, :], (B, A, feat.shape[-1]))
        adv_in = jnp.concatenate([feat_rep, actions], axis=-1)
        adv = MLP(
            hidden_dims=(self.hidden_dims[-1],), output_dim=1, name="advantage_arch"
        )(adv_in.reshape(B * A, -1)).reshape(B, A)
        if mask is None:
            adv_mean = jnp.mean(adv, axis=-1, keepdims=True)
        else:
            m = mask.astype(adv.dtype)
            adv_mean = jnp.sum(adv * m, axis=-1, keepdims=True) / jnp.maximum(
                jnp.sum(m, axis=-1, keepdims=True), 1.0
            )
        return value[:, None] + adv - adv_mean


@dataclasses.dataclass(frozen=True)
class DuelingQValueNetwork:
    hidden_dims: Sequence[int] = (64, 64)

    def init(self, key, state_dim: int, action_dim: int, num_actions: int):
        m = _DuelingNet(tuple(self.hidden_dims))
        return m.init(
            key, jnp.zeros((1, state_dim)), jnp.zeros((1, num_actions, action_dim))
        )["params"]

    def q_all(self, params, state, actions, mask=None):
        m = _DuelingNet(tuple(self.hidden_dims))
        return m.apply({"params": params}, state, actions, mask)


class _TwoTowerNet(nn.Module):
    """Separate state/action towers -> interaction MLP (reference
    TwoTowerQValueNetwork, q_value_networks.py:518-639)."""

    state_hidden_dims: Sequence[int]
    action_hidden_dims: Sequence[int]
    hidden_dims: Sequence[int]
    state_output_dim: int
    action_output_dim: int

    @nn.compact
    def __call__(self, state, action):
        s = MLP(
            hidden_dims=tuple(self.state_hidden_dims),
            output_dim=self.state_output_dim,
            last_activation="relu",
            name="state_tower",
        )(state)
        a = MLP(
            hidden_dims=tuple(self.action_hidden_dims),
            output_dim=self.action_output_dim,
            last_activation="relu",
            name="action_tower",
        )(action)
        x = jnp.concatenate([s, a], axis=-1)
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=1, name="interaction")(x)


@dataclasses.dataclass(frozen=True)
class TwoTowerQValueNetwork:
    state_hidden_dims: Sequence[int] = (64,)
    action_hidden_dims: Sequence[int] = (64,)
    hidden_dims: Sequence[int] = (64, 64)
    state_output_dim: int = 64
    action_output_dim: int = 64

    def _module(self):
        return _TwoTowerNet(
            tuple(self.state_hidden_dims),
            tuple(self.action_hidden_dims),
            tuple(self.hidden_dims),
            self.state_output_dim,
            self.action_output_dim,
        )

    def init(self, key, state_dim: int, action_dim: int, num_actions: int):
        del num_actions
        m = self._module()
        return m.init(key, jnp.zeros((1, state_dim)), jnp.zeros((1, action_dim)))["params"]

    def q_all(self, params, state, actions, mask=None):
        m = self._module()
        return over_actions(
            lambda s, a: m.apply({"params": params}, s, a), state, actions
        )[..., 0]


@dataclasses.dataclass(frozen=True)
class QuantileQValueNetwork:
    """Quantile-distributional Q (reference q_value_networks.py:253-350).

    `taus()` returns the N+1 quantile edges; `midpoints()` the N midpoints
    tau-hat used by the QR loss."""

    hidden_dims: Sequence[int] = (64, 64)
    num_quantiles: int = 10
    use_layer_norm: bool = False

    def _module(self):
        return _PairQNet(
            hidden_dims=tuple(self.hidden_dims),
            output_dim=self.num_quantiles,
            use_layer_norm=self.use_layer_norm,
        )

    def taus(self) -> jnp.ndarray:
        return jnp.linspace(0.0, 1.0, self.num_quantiles + 1)

    def midpoints(self) -> jnp.ndarray:
        t = self.taus()
        return (t[:-1] + t[1:]) / 2.0

    def init(self, key, state_dim: int, action_dim: int, num_actions: int):
        del num_actions
        m = self._module()
        return m.init(key, jnp.zeros((1, state_dim)), jnp.zeros((1, action_dim)))["params"]

    def quantiles_all(self, params, state, actions, mask=None):
        """(B, A, N) quantile values for every candidate action."""
        m = self._module()
        return over_actions(
            lambda s, a: m.apply({"params": params}, s, a), state, actions
        )

    def q_all(self, params, state, actions, mask=None):
        """Mean over quantiles — risk-neutral Q (used when no safety module)."""
        return jnp.mean(self.quantiles_all(params, state, actions, mask), axis=-1)


class _PriorQNet(nn.Module):
    """Trainable net; the frozen additive prior is handled by the adapter
    (reference MLPWithPrior, common/epistemic_neural_networks.py:51-84)."""

    hidden_dims: Sequence[int]

    @nn.compact
    def __call__(self, state, action):
        x = jnp.concatenate([state, action], axis=-1)
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=1)(x)


@dataclasses.dataclass(frozen=True)
class EnsembleQValueNetwork:
    """K Q-nets with additive frozen random priors (reference
    EnsembleQValueNetwork, q_value_networks.py:642-711, over `Ensemble`,
    common/epistemic_neural_networks.py:87-137).

    Params are a dict {"train": stacked (K, ...), "prior": stacked (K, ...)}.
    The "prior" subtree must be excluded from optimization: learners do this by
    updating only params["train"] (see BootstrappedDQN). All K members evaluate
    in one vmapped pass (a single batched matmul per layer), replacing the
    reference's Python loop in `ensemble_forward`.
    """

    hidden_dims: Sequence[int] = (64, 64)
    ensemble_size: int = 10
    prior_scale: float = 0.3

    def _module(self):
        return _PriorQNet(tuple(self.hidden_dims))

    def init(self, key, state_dim: int, action_dim: int, num_actions: int):
        del num_actions
        m = self._module()
        s0, a0 = jnp.zeros((1, state_dim)), jnp.zeros((1, action_dim))
        k_train, k_prior = jax.random.split(key)

        def one(k):
            return m.init(k, s0, a0)["params"]

        train = jax.vmap(one)(jax.random.split(k_train, self.ensemble_size))
        prior = jax.vmap(one)(jax.random.split(k_prior, self.ensemble_size))
        return {"train": train, "prior": prior}

    def _member_q(self, train_p, prior_p, s_flat, a_flat):
        m = self._module()
        base = m.apply({"params": train_p}, s_flat, a_flat)[..., 0]
        prior = m.apply({"params": prior_p}, s_flat, a_flat)[..., 0]
        return base + self.prior_scale * jax.lax.stop_gradient(prior)

    def q_ensemble(self, params, state, actions, mask=None):
        """(B, K, A): Q for every ensemble member and candidate action."""
        B, A = actions.shape[0], actions.shape[1]
        s_flat = jnp.broadcast_to(state[:, None, :], (B, A, state.shape[-1])).reshape(
            B * A, -1
        )
        a_flat = actions.reshape(B * A, -1)
        q = jax.vmap(lambda tp, pp: self._member_q(tp, pp, s_flat, a_flat))(
            params["train"], params["prior"]
        )  # (K, B*A)
        return q.reshape(self.ensemble_size, B, A).transpose(1, 0, 2)

    def q_member(self, params, state, actions, z, mask=None):
        """(B, A): Q under per-row ensemble index z (B,) i32."""
        q = self.q_ensemble(params, state, actions, mask)  # (B, K, A)
        return jnp.take_along_axis(q, z[:, None, None], axis=1)[:, 0, :]

    def q_all(self, params, state, actions, mask=None):
        """Ensemble mean (used when acting without deep exploration)."""
        return jnp.mean(self.q_ensemble(params, state, actions, mask), axis=1)


class _CNNQNet(nn.Module):
    conv: ConvNet
    hidden_dims: Sequence[int]
    num_actions: int

    @nn.compact
    def __call__(self, state):
        feat = self.conv(state)
        return MLP(hidden_dims=tuple(self.hidden_dims), output_dim=self.num_actions)(feat)


@dataclasses.dataclass(frozen=True)
class CNNQValueNetwork:
    """Atari-style CNN multi-head Q (reference CNNQValueMultiHeadNetwork,
    q_value_networks.py:714-926). `state` is an NHWC image batch."""

    input_shape: Tuple[int, int, int] = (84, 84, 4)  # (H, W, C)
    out_channels: Sequence[int] = (16, 32)
    kernel_sizes: Sequence[int] = (8, 4)
    strides: Sequence[int] = (4, 2)
    paddings: Sequence[int] = (0, 0)
    hidden_dims: Sequence[int] = (128,)
    # time_major_stack: the flattened state is a TIME-MAJOR frame window
    # (T, H, W, frame_channels) — the layout StackingHistorySummarization(
    # include_action=False) stores and VisualReplayBuffer reconstructs —
    # transposed here to NHWC with C = T * frame_channels (the classic
    # frame-stack-as-channels Atari input). frame_channels=1 is the
    # grayscale-Atari case; >1 stacks multi-channel frames (e.g. Breakout's
    # 4 feature channels with stack 4 -> input_shape (10, 10, 16)).
    time_major_stack: bool = False
    frame_channels: int = 1
    # conv1_cache: incremental-conv1 act path (ops/conv_cache.py) — caches
    # each resident frame's conv1 contribution under all T position-kernels
    # so NO conv ever reads the frame-ring loop carry (the round-4/5 XLA
    # layout cliff, docs/xla_layout_repro.py). Exact up to f32 summation
    # grouping; requires time_major_stack, frame_channels == 1 and
    # paddings[0] == 0, and a PearlAgent (which maintains/refreshes the
    # cache around observes and weight updates).
    conv1_cache: bool = False

    @property
    def supports_frame_ring(self) -> bool:
        """Ring-aware marker: this net consumes a `FrameRingView` directly
        (`_q_all_ring`); `PearlAgent._frame_path` requires it so a
        FrameRing summarizer paired with a non-ring-aware net fails at
        construction, not with an opaque TypeError mid-trace."""
        return self.time_major_stack

    def _module(self, num_actions):
        conv = ConvNet(
            out_channels=tuple(self.out_channels),
            kernel_sizes=tuple(self.kernel_sizes),
            strides=tuple(self.strides),
            paddings=tuple(self.paddings),
        )
        return _CNNQNet(conv, tuple(self.hidden_dims), num_actions)

    def init(self, key, state_dim: int, action_dim: int, num_actions: int):
        # state_dim is the flattened image size; learners pass flattened states
        # and we reshape to the configured input shape.
        del state_dim, action_dim
        m = self._module(num_actions)
        return m.init(key, jnp.zeros((1,) + tuple(self.input_shape)))["params"]

    def q_all(self, params, state, actions, mask=None):
        num_actions = actions.shape[1]
        if not isinstance(state, jnp.ndarray) and hasattr(state, "ring"):
            return self._q_all_ring(params, state, num_actions)
        m = self._module(num_actions)
        H, W, C = self.input_shape
        if self.time_major_stack:
            fc = self.frame_channels
            T = C // fc
            imgs = (
                state.reshape((state.shape[0], T, H, W, fc))
                .transpose(0, 2, 3, 1, 4)
                .reshape((state.shape[0], H, W, C))
            )
        else:
            imgs = state.reshape((state.shape[0],) + tuple(self.input_shape))
        return m.apply({"params": params}, imgs)

    # ------------------------------------------------ conv1-cache act path
    def _conv1_dims(self):
        H, W, C = self.input_shape
        T = C // self.frame_channels
        k, s, p = self.kernel_sizes[0], self.strides[0], self.paddings[0]
        OH = (H + 2 * p - k) // s + 1
        OW = (W + 2 * p - k) // s + 1
        return T, H, W, k, s, OH, OW, self.out_channels[0]

    @property
    def cache_enabled(self) -> bool:
        from pearl_tpu.ops.conv_cache import use_conv1_cache

        if not (self.conv1_cache and self.time_major_stack):
            return False
        if self.frame_channels != 1 or self.paddings[0] != 0:
            raise ValueError(
                "conv1_cache requires frame_channels == 1 and paddings[0] == 0"
            )
        return use_conv1_cache()

    def cache_dim(self) -> int:
        T, _, _, _, _, OH, OW, OC = self._conv1_dims()
        return T * OH * OW * OC

    def _k64(self, params, dtype):
        """conv1 kernel as (k, k, 1, T*OC) position-major single-input-channel
        form, with the /255 input normalization folded in (conv(x/255, W) ==
        conv(x, W/255))."""
        T, _, _, k, _, _, _, OC = self._conv1_dims()
        k0 = params["conv"]["conv_0"]["kernel"].astype(dtype) / 255.0
        return k0.reshape(k, k, 1, T * OC)

    def cache_contrib_y(self, params, entry_fb):
        """New-frame contrib conv output (B, OH, OW, T*OC) from the (F, B)
        ring entry.

        The barrier pins the entry as a MATERIALIZED (F, B) buffer — the
        same buffer the in-place ring write consumes (CSE), so it is free.
        Without it XLA fuses the observation producer (env generator + reset
        select) into the conv's input and re-evaluates it per conv tap
        (4.8 ms/step measured); with the barrier on the 4-D conv-input form
        instead, the producer materializes into the conv's padded
        batch-minor layout at 2.9 ms/step. Barrier on the natural 2-D form,
        and the conv consumes it through an HWNC dimension spec — the (F, B)
        bytes ARE the conv input, no second logical form exists in the
        graph (measured identical to NHWC standalone)."""
        _, H, W, _, _, _, _, _ = self._conv1_dims()
        B = entry_fb.shape[1]
        frames = jax.lax.optimization_barrier(entry_fb).reshape(H, W, B, 1)
        return self._contrib_conv(params, frames)

    def _contrib_conv(self, params, frames_hwb1):
        """(H, W, N, 1) HWNC frames -> (N, OH, OW, T*OC) all-position conv1
        contributions (pre-bias, pre-relu), channel index = p*OC + oc."""
        _, _, _, _, s, _, _, _ = self._conv1_dims()
        k64 = self._k64(params, frames_hwb1.dtype)
        return jax.lax.conv_general_dilated(
            frames_hwb1, k64, window_strides=(s, s), padding=[(0, 0), (0, 0)],
            dimension_numbers=("HWNC", "HWIO", "NHWC"),
        )

    def refresh_cache(self, params, view):
        """Recompute the whole (T, P, D, B) diagonal cache from the ring —
        called by the agent after every conv1 weight update so cached
        contributions always use current weights. Per ring slot: one
        single-frame conv (the slot read goes through copy_fence on TPU so
        this per-learn conv cannot re-pin the carry's layout), then a static
        diagonal assembly (ops/conv_cache.py)."""
        from pearl_tpu.ops.conv_cache import cache_write

        T, H, W, _, _, _, _, OC = self._conv1_dims()
        D = self.cache_dim() // T
        ring = view.ring
        B = ring.shape[0]
        cache = view.cache
        if cache is None:
            cache = jnp.zeros((T, T, D, B), ring.dtype)
        # Per slot: one single-frame conv, then the SAME diagonal write the
        # per-step path uses (cursor == s reproduces slot s's diagonal rows
        # j = (s - p) % T). The Pallas DMAs read the conv output's strided
        # channel chunks natively — an XLA transpose/stack assembly here
        # measured 1.5-3.6 ms per refresh (copy.264, round-5 profiles).
        for s in range(T):
            rows_fb = jnp.transpose(ring[:, s, :], (1, 0))
            if jax.default_backend() == "tpu":
                from pearl_tpu.ops.layout_fence import copy_fence

                rows_fb = copy_fence(rows_fb)
            y = self._contrib_conv(params, rows_fb.reshape(H, W, B, 1))
            cache = cache_write(cache, y, jnp.int32(s), T=T, OC=OC)
        return cache

    def _q_all_cached(self, params, view, num_actions):
        """Act-path Q from the contribution cache: conv1(window) as a
        one-slice masked sum over the diagonal cache (ops/conv_cache.py
        module docstring), then the standard conv/MLP tail on the FRESH sum
        (no carry reads anywhere)."""
        from pearl_tpu.neural_networks.common import resolve_activation
        from pearl_tpu.ops.conv_cache import gather_sum

        _, _, _, _, _, OH, OW, OC = self._conv1_dims()
        B = view.ring.shape[0]
        act = resolve_activation("relu")
        acc = gather_sum(view.cache, view.valid, view.cursor)  # (D, B) f32
        b0 = params["conv"]["conv_0"]["bias"].astype(jnp.float32)
        y = act(acc.reshape(OH, OW, OC, B) + b0[None, None, :, None])
        y = jnp.transpose(y, (3, 0, 1, 2)).astype(view.ring.dtype)
        return self._conv_tail(params, y, B, num_actions)

    def _conv_tail(self, params, y, B, num_actions):
        from pearl_tpu.neural_networks.common import resolve_activation

        act = resolve_activation("relu")
        for i in range(1, len(self.out_channels)):
            ki = params["conv"][f"conv_{i}"]["kernel"].astype(y.dtype)
            bi = params["conv"][f"conv_{i}"]["bias"].astype(y.dtype)
            si, pi = self.strides[i], self.paddings[i]
            y = jax.lax.conv_general_dilated(
                y, ki, window_strides=(si, si), padding=[(pi, pi), (pi, pi)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = act(y + bi)
        feat = y.reshape(B, -1)
        return MLP(
            hidden_dims=tuple(self.hidden_dims), output_dim=num_actions
        ).apply({"params": params["MLP_0"]}, feat)

    def _q_all_ring(self, params, view, num_actions):
        """Consume a `FrameRingView` (circular frame window) WITHOUT
        materializing the time-ordered stack: the first conv's input channels
        are the T frames, so rolling its kernel by the ring cursor is exactly
        equivalent to rolling the input into time order (convolution commutes
        with a shared input-channel permutation), and invalid frames (episode
        zero padding) are masked as the conv reads them. The kernel roll
        touches a few KB of weights; the input roll it replaces would move
        the whole window per act. See
        history_summarization_modules/frame_ring.py."""
        if not self.time_major_stack:
            raise ValueError(
                "FrameRingView input requires time_major_stack=True (the ring "
                "axis is the frame-stack axis)"
            )
        if (
            getattr(view, "cache", None) is not None
            and not getattr(view, "from_replay", False)
            and self.cache_enabled
        ):
            return self._q_all_cached(params, view, num_actions)
        from pearl_tpu.neural_networks.common import resolve_activation

        H, W, C = self.input_shape
        fc = self.frame_channels
        T = C // fc
        ring, valid, cursor = view.ring, view.valid, view.cursor
        B = ring.shape[0]
        act = resolve_activation("relu")
        k0 = params["conv"]["conv_0"]["kernel"].astype(ring.dtype)
        b0 = params["conv"]["conv_0"]["bias"].astype(ring.dtype)
        # Time order t -> ring slot (cursor + t) % T, so
        # W_ring[s] = W_time[(s - cursor) % T]  <=>  roll(W_time, cursor).
        k0r = jnp.roll(k0, cursor * fc, axis=2)
        s0, p0 = self.strides[0], self.paddings[0]
        from pearl_tpu.ops.ring_conv import (
            ring_conv_applicable,
            ring_conv1,
            use_ring_conv,
        )

        rc_bb = 512 if B % 512 == 0 else 128
        if (
            use_ring_conv()
            and not getattr(view, "from_replay", True)
            and jax.default_backend() == "tpu"
            and ring_conv_applicable(
                B, T, H, W, fc, self.kernel_sizes[0], s0, p0, rc_bb
            )
        ):
            # Pallas path (TPU act path, fc==1, no padding): conv1 + mask +
            # /255 + bias + relu in one kernel that reads the ring in its
            # NATIVE {0,2,1} layout — no relayout copies, no masked-input
            # materialization, and the XLA conv never touches the carry
            # (ops/ring_conv.py). The /255 normalization is folded into the
            # kernel weights (exact: conv(x/255, W) == conv(x, W/255)).
            k = self.kernel_sizes[0]
            wmat = (k0r / 255.0).transpose(2, 0, 1, 3).reshape(T * k * k, -1)
            y = ring_conv1(
                ring, valid, wmat, b0, H=H, W=W, k=k, s=s0, batch_block=rc_bb
            )  # (B, OH, OW, OC)
        else:
            from pearl_tpu.ops.layout_fence import (
                masked_scale_fence,
                masked_scale_fence4,
                use_layout_fence,
            )

            # Pallas layout fence (opt-in): same `ring * valid / 255` math,
            # but produced behind a fixed-row-major Pallas call so the XLA
            # conv's batch-minor input layout cannot propagate into the
            # frame-ring carry (act) or the replay frame ring (learn). Pairs
            # with the push-path copy_fence — severing only the conv chain
            # leaves the carry<->replay-ring layout CYCLE intact (measured,
            # ops/layout_fence.py + docs/PARITY.md round-5 ladder).
            fence = use_layout_fence() and jax.default_backend() == "tpu"
            if fc == 1:
                if fence:
                    # 4-D fence: emits the NCHW conv input directly (an XLA
                    # reshape here materialized as a 0.22 ms/step copy).
                    inp = masked_scale_fence4(ring, valid, H=H, W=W, div=255.0)
                else:
                    x = ring * valid[..., None].astype(ring.dtype)
                    # Same /255 normalization as ConvNet, in the ring dtype
                    # (for a float32 ring this matches ConvNet.normalize
                    # bit-for-bit).
                    x = x / 255.0
                    inp = x.reshape(B, T, H, W)  # NCHW, C = T: no transpose
                dn = ("NCHW", "HWIO", "NHWC")
            else:
                if fence:
                    x = masked_scale_fence(ring, valid, div=255.0)
                else:
                    x = ring * valid[..., None].astype(ring.dtype)
                    x = x / 255.0
                inp = (
                    x.reshape(B, T, H, W, fc)
                    .transpose(0, 2, 3, 1, 4)
                    .reshape(B, H, W, C)
                )
                dn = ("NHWC", "HWIO", "NHWC")
            y = jax.lax.conv_general_dilated(
                inp, k0r, window_strides=(s0, s0), padding=[(p0, p0), (p0, p0)],
                dimension_numbers=dn,
            )
            y = act(y + b0)
        return self._conv_tail(params, y, B, num_actions)
