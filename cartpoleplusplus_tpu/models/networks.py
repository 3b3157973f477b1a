"""Agent networks: policy / Q / actor-critic / NAF heads.

Rebuilds the model layer of each reference agent as flax modules:
  * DiscretePolicy  ← lrpg_cartpole.py:~L40-80   (softmax policy MLP)
  * QNetwork        ← dqn_cartpole.py            (keras Sequential Q-MLP)
  * Actor / Critic  ← ddpg_cartpole.py:~L60-150  (tanh actor; critic with the
                       action injected at a late FC layer)
  * NAFNetwork      ← naf_cartpole.py:~L80-170   (V, µ, L heads with
                       A(s,a) = -½ (a-µ)ᵀ L Lᵀ (a-µ), Q = V + A)

All heads run their matmuls in bfloat16 (MXU) with float32 params/outputs.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from cartpoleplusplus_tpu.models.trunks import DEFAULT_HIDDEN, MLPTrunk, ObsEncoder


def final_layer_init(scale: float = 3e-3):
    """Small symmetric-uniform init for output heads.

    The DDPG paper's final-layer init (±3e-3), which the reference's TF nets
    replicate: keeps initial actions/values near zero so the actor does not
    start (or collapse) at the tanh rails before the critic is informative.
    """

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class NoisyDense(nn.Module):
    """Factorized-Gaussian noisy linear layer (Fortunato et al. 2018).

    W = W_mu + W_sigma ⊙ (f(eps_in) f(eps_out)ᵀ), f(x) = sign(x)·√|x| —
    the factorized form needs in+out noise draws instead of in·out, and the
    rank-1 outer product fuses into the matmul epilogue on TPU.  With
    ``deterministic=True`` (eval / greedy acting) only the mu weights run.
    Exploration becomes state-conditional and LEARNED (sigma params shrink
    as the policy firms up), replacing ε-greedy in Rainbow.
    """

    features: int
    sigma0: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        import jax

        in_f = x.shape[-1]
        bound = 1.0 / jnp.sqrt(in_f)
        w_mu = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (in_f, self.features),
        )
        b_mu = self.param(
            "bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.features,),
        )
        sig0 = self.sigma0 / float(in_f) ** 0.5
        w_sig = self.param(
            "kernel_sigma", nn.initializers.constant(sig0),
            (in_f, self.features),
        )
        b_sig = self.param(
            "bias_sigma", nn.initializers.constant(sig0), (self.features,)
        )
        if deterministic:
            return x @ w_mu + b_mu
        k1, k2 = jax.random.split(self.make_rng("noise"))
        f = lambda e: jnp.sign(e) * jnp.sqrt(jnp.abs(e))
        e_in = f(jax.random.normal(k1, (in_f,)))
        e_out = f(jax.random.normal(k2, (self.features,)))
        w = w_mu + w_sig * (e_in[:, None] * e_out[None, :])
        b = b_mu + b_sig * e_out
        return x @ w + b


class DiscretePolicy(nn.Module):
    """Softmax policy over the 5 discrete actions (LRPG)."""

    num_actions: int = 5
    use_raw_pixels: bool = False
    pixel_encoder: str = "dense"
    pixel_pool: int = 1
    height: int = 50  # obs frame dims as carried (post config.obs_pool)
    width: int = 50
    hidden: Sequence[int] = DEFAULT_HIDDEN

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = ObsEncoder(self.use_raw_pixels, self.hidden, pixel_encoder=self.pixel_encoder, pixel_pool=self.pixel_pool, height=self.height, width=self.width)(obs, train)
        return nn.Dense(self.num_actions, name="logits")(h)


class QNetwork(nn.Module):
    """Per-action Q values (DQN).

    ``dueling=True`` (Wang et al. 2016, beyond-parity --dueling flag)
    decomposes Q(s, a) = V(s) + A(s, a) − mean_a A(s, a): the shared
    encoder feeds a scalar value head and an advantage head; the mean
    subtraction keeps the decomposition identifiable.  On TPU both heads
    are one fused MXU matmul each off the same encoder activations.
    """

    num_actions: int = 5
    use_raw_pixels: bool = False
    pixel_encoder: str = "dense"
    pixel_pool: int = 1
    height: int = 50  # obs frame dims as carried (post config.obs_pool)
    width: int = 50
    hidden: Sequence[int] = DEFAULT_HIDDEN
    dueling: bool = False
    num_atoms: int = 0  # >0: C51 — per-action LOGITS over that many atoms
    noisy: bool = False  # NoisyNet heads (pass noise=True + a 'noise' rng)

    @nn.compact
    def __call__(
        self, obs: jnp.ndarray, train: bool = False, noise: bool = False
    ) -> jnp.ndarray:
        h = ObsEncoder(self.use_raw_pixels, self.hidden, pixel_encoder=self.pixel_encoder, pixel_pool=self.pixel_pool, height=self.height, width=self.width)(obs, train)
        if self.noisy:
            # Same param names as the Dense heads (kernel/bias, plus the
            # *_sigma extras), so checkpoints stay structurally familiar.
            dense = lambda f, name: (
                lambda x: NoisyDense(f, name=name)(x, deterministic=not noise)
            )
        else:
            dense = lambda f, name: nn.Dense(f, name=name)
        if self.num_atoms:
            # Distributional (C51): (B, A, K) atom logits; the dueling
            # decomposition applies per atom in LOGIT space (Rainbow's
            # formulation) before the softmax.
            k = self.num_atoms
            a = dense(self.num_actions * k, "advantage")(h)
            a = a.reshape(a.shape[:-1] + (self.num_actions, k))
            if self.dueling:
                v = dense(k, "value")(h)[..., None, :]
                return v + a - jnp.mean(a, axis=-2, keepdims=True)
            return a
        if self.dueling:
            v = dense(1, "value")(h)
            a = dense(self.num_actions, "advantage")(h)
            return v + a - jnp.mean(a, axis=-1, keepdims=True)
        return dense(self.num_actions, "q")(h)


class Actor(nn.Module):
    """Deterministic policy µ(s) with tanh-bounded 2D output (DDPG).

    Reference: ddpg_cartpole.py ActorNetwork — MLP (+conv trunk for pixels)
    ending in tanh so actions live in [-1, 1]².
    """

    action_dim: int = 2
    use_raw_pixels: bool = False
    pixel_encoder: str = "dense"
    pixel_pool: int = 1
    height: int = 50  # obs frame dims as carried (post config.obs_pool)
    width: int = 50
    hidden: Sequence[int] = DEFAULT_HIDDEN
    use_batch_norm: bool = False

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = ObsEncoder(
            self.use_raw_pixels, self.hidden,
            pixel_encoder=self.pixel_encoder,
            pixel_pool=self.pixel_pool,
            height=self.height, width=self.width,
            use_batch_norm=self.use_batch_norm,
        )(obs, train)
        return nn.tanh(
            nn.Dense(
                self.action_dim, name="mu",
                kernel_init=final_layer_init(), bias_init=final_layer_init(),
            )(h)
        )


class GaussianActor(nn.Module):
    """Stochastic tanh-squashed Gaussian policy π(a|s) (SAC).

    Beyond reference parity: the upstream agent zoo (SURVEY.md §2.1) stops at
    DDPG/NAF for continuous control; SAC (Haarnoja et al. 2018) is the modern
    maximum-entropy successor and reuses this framework's encoder/critic/
    replay stack unchanged.  Same ObsEncoder trunk as :class:`Actor`; two
    heads emit the pre-squash mean and a clamped log-std.  Sampling and the
    tanh log-prob correction live in agents/sac.py (pure jnp — the module
    stays a deterministic function of (params, obs)).
    """

    action_dim: int = 2
    use_raw_pixels: bool = False
    pixel_encoder: str = "dense"
    pixel_pool: int = 1
    height: int = 50
    width: int = 50
    hidden: Sequence[int] = DEFAULT_HIDDEN
    use_batch_norm: bool = False
    log_std_min: float = -20.0
    log_std_max: float = 2.0

    @nn.compact
    def __call__(
        self, obs: jnp.ndarray, train: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        h = ObsEncoder(
            self.use_raw_pixels, self.hidden,
            pixel_encoder=self.pixel_encoder,
            pixel_pool=self.pixel_pool,
            height=self.height, width=self.width,
            use_batch_norm=self.use_batch_norm,
        )(obs, train)
        mu = nn.Dense(
            self.action_dim, name="mu",
            kernel_init=final_layer_init(), bias_init=final_layer_init(),
        )(h)
        log_std = nn.Dense(
            self.action_dim, name="log_std",
            kernel_init=final_layer_init(), bias_init=final_layer_init(),
        )(h)
        return mu, jnp.clip(log_std, self.log_std_min, self.log_std_max)


class ValueNetwork(nn.Module):
    """V(s) head for on-policy actor-critic (PPO).

    Beyond reference parity (the upstream zoo's only on-policy agent is
    plain REINFORCE, lrpg_cartpole.py): a state-value baseline over the same
    ObsEncoder trunk, used by agents/ppo.py for GAE advantages.
    """

    use_raw_pixels: bool = False
    pixel_encoder: str = "dense"
    pixel_pool: int = 1
    height: int = 50
    width: int = 50
    hidden: Sequence[int] = DEFAULT_HIDDEN

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = ObsEncoder(
            self.use_raw_pixels, self.hidden,
            pixel_encoder=self.pixel_encoder,
            pixel_pool=self.pixel_pool,
            height=self.height, width=self.width,
        )(obs, train)
        return nn.Dense(
            1, name="v",
            kernel_init=final_layer_init(), bias_init=final_layer_init(),
        )(h)[..., 0]


class Critic(nn.Module):
    """Q(s, a) with the action injected at a late hidden layer (DDPG).

    Reference: ddpg_cartpole.py CriticNetwork — the state trunk runs first and
    the action is concatenated into the penultimate FC layer, the standard
    DDPG-paper wiring.
    """

    use_raw_pixels: bool = False
    pixel_encoder: str = "dense"
    pixel_pool: int = 1
    height: int = 50  # obs frame dims as carried (post config.obs_pool)
    width: int = 50
    hidden: Sequence[int] = DEFAULT_HIDDEN
    use_batch_norm: bool = False

    @nn.compact
    def __call__(
        self, obs: jnp.ndarray, action: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        h = ObsEncoder(
            self.use_raw_pixels, self.hidden,
            pixel_encoder=self.pixel_encoder,
            pixel_pool=self.pixel_pool,
            height=self.height, width=self.width,
            use_batch_norm=self.use_batch_norm,
        )(obs, train)
        h = jnp.concatenate([h, action.astype(h.dtype)], axis=-1)
        h = MLPTrunk((self.hidden[-1],))(h)
        return nn.Dense(
            1, name="q",
            kernel_init=final_layer_init(), bias_init=final_layer_init(),
        )(h)[..., 0]


class NAFNetwork(nn.Module):
    """Normalized Advantage Function heads: V(s), µ(s), L(s).

    Reference: naf_cartpole.py:~L80-170 — one trunk, three heads; L is a
    lower-triangular matrix with exponentiated diagonal so P = L Lᵀ is PD;
    A(s,a) = -½ (a-µ)ᵀ P (a-µ); Q = V + A.  Batch-norm is the reference's
    --use-batch-norm option (README discusses its fiddliness).
    """

    action_dim: int = 2
    use_raw_pixels: bool = False
    pixel_encoder: str = "dense"
    pixel_pool: int = 1
    height: int = 50  # obs frame dims as carried (post config.obs_pool)
    width: int = 50
    hidden: Sequence[int] = DEFAULT_HIDDEN
    use_batch_norm: bool = False

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False):
        h = ObsEncoder(
            self.use_raw_pixels, self.hidden,
            pixel_encoder=self.pixel_encoder,
            pixel_pool=self.pixel_pool,
            height=self.height, width=self.width,
            use_batch_norm=self.use_batch_norm,
        )(obs, train)
        v = nn.Dense(
            1, name="value",
            kernel_init=final_layer_init(), bias_init=final_layer_init(),
        )(h)[..., 0]
        mu = nn.tanh(
            nn.Dense(
                self.action_dim, name="mu",
                kernel_init=final_layer_init(), bias_init=final_layer_init(),
            )(h)
        )
        n = self.action_dim
        # Small init so L starts ≈ I (diag exp(0)=1, off-diag ≈ 0): the
        # advantage begins as a gentle -½‖a-µ‖² bowl instead of a random
        # quadratic, which round-1 sweeps showed was the difference between
        # NAF learning and its TD loss exploding (runs/sweep_naf_s*.jsonl).
        l_flat = nn.Dense(
            n * (n + 1) // 2, name="l_entries",
            kernel_init=final_layer_init(), bias_init=final_layer_init(),
        )(h)
        return v, mu, l_flat

    # Bound on the log-diagonal of L: |exp(d)| ∈ [e⁻⁵, e²].  Unbounded, the
    # curvature P = L Lᵀ can blow up quadratically in the TD loss — the
    # runaway mode seen in round 1 (loss 2.8 → 17 across seeds).  A clamp
    # preserves the NAF parameterization (P stays PD) while capping the
    # advantage's sharpness; gradients still flow inside the bounds.
    # Deliberately UNannotated: an annotation would make these linen
    # dataclass fields, accepting per-instance overrides that the static
    # clamp below would silently ignore.
    LOG_DIAG_MIN = -5.0
    LOG_DIAG_MAX = 2.0

    @staticmethod
    def lower_triangular(l_flat: jnp.ndarray, action_dim: int) -> jnp.ndarray:
        """Unpack flat entries into L with exp'd diagonal (naf ~L120-140)."""
        b = l_flat.shape[:-1]
        rows, cols = jnp.tril_indices(action_dim)
        L = jnp.zeros(b + (action_dim, action_dim), l_flat.dtype)
        L = L.at[..., rows, cols].set(l_flat)
        d = jnp.clip(
            jnp.diagonal(L, axis1=-2, axis2=-1),
            NAFNetwork.LOG_DIAG_MIN, NAFNetwork.LOG_DIAG_MAX,
        )
        eye = jnp.eye(action_dim, dtype=l_flat.dtype)
        off_diag = L - eye * jnp.diagonal(L, axis1=-2, axis2=-1)[..., None, :]
        return off_diag + eye * jnp.exp(d)[..., None, :]

    @staticmethod
    def advantage(
        l_flat: jnp.ndarray, mu: jnp.ndarray, action: jnp.ndarray
    ) -> jnp.ndarray:
        """A(s,a) = -½ (a-µ)ᵀ L Lᵀ (a-µ)."""
        n = mu.shape[-1]
        L = NAFNetwork.lower_triangular(l_flat, n)
        d = (action - mu)[..., None]  # (..., n, 1)
        Ld = jnp.swapaxes(L, -1, -2) @ d  # Lᵀ(a-µ)
        return -0.5 * jnp.sum(Ld[..., 0] ** 2, axis=-1)

    @staticmethod
    def q_value(v, l_flat, mu, action):
        return v + NAFNetwork.advantage(l_flat, mu, action)
