"""Environment configuration — the TPU rebuild of the reference's flag system.

The reference composes argparse flags by convention: ``bullet_cartpole.add_opts
(parser)`` contributes the env flags and each agent main merges them
(reference: bullet_cartpole.py:~L30-60, SURVEY.md §5).  The rebuild keeps that
shape — an ``add_opts`` that registers the same flags — but backs it with a
frozen dataclass so the config can be closed over by jitted functions.

All defaults are reconstructed from the public matpalm/cartpoleplusplus repo
(the reference mount is empty; see SURVEY.md provenance warning).
"""

from __future__ import annotations

import argparse
import dataclasses

# Reward calculation modes (reference: --reward-calc, bullet_cartpole.py).
REWARD_FIXED = "fixed"  # +1 per surviving step
REWARD_ANGLE = "angle"  # reward ∝ pole uprightness
REWARD_ACTION = "action"  # +1 minus action-magnitude penalty
REWARD_ANGLE_ACTION = "angle_action"  # both
REWARD_CALCS = (REWARD_FIXED, REWARD_ANGLE, REWARD_ACTION, REWARD_ANGLE_ACTION)

# Discrete action table: index → (fx, fy) direction, scaled by action_force.
# Reference (bullet_cartpole.py:~L195-205): 5 discrete actions = nop, ±x, ±y.
DISCRETE_ACTIONS = ((0.0, 0.0), (-1.0, 0.0), (1.0, 0.0), (0.0, -1.0), (0.0, 1.0))
NUM_DISCRETE_ACTIONS = len(DISCRETE_ACTIONS)


@dataclasses.dataclass(frozen=True)
class CartpoleConfig:
    """Static env parameters (hashable, safe to close over under jit).

    Field ↔ reference flag map (bullet_cartpole.add_opts):
      action_force        ↔ --action-force   (N applied to the cart)
      initial_force       ↔ --initial-force  (random push at reset)
      initial_force_steps ↔ (constant 30 substeps in the reference reset)
      action_repeats      ↔ --action-repeats (obs frames per step)
      steps_per_repeat    ↔ --steps-per-repeat (physics substeps per frame)
      max_episode_len     ↔ --max-episode-len
      use_raw_pixels      ↔ --use-raw-pixels
      render_width/height ↔ --render-width / --render-height
      num_cameras         ↔ --num-cameras (1 or 2)
      reward_calc         ↔ --reward-calc
      discrete_actions    ↔ chosen by the agent (LRPG/DQN discrete, DDPG/NAF
                            continuous); here an explicit field
    """

    discrete_actions: bool = True
    action_force: float = 50.0
    initial_force: float = 55.0
    initial_force_steps: int = 30
    action_repeats: int = 3
    steps_per_repeat: int = 5
    max_episode_len: int = 200
    random_theta_jitter: float = 0.01  # pole pose jitter at reset (rad)
    # Termination thresholds (reference checks the POLE pose:
    # bullet_cartpole.py:~L230-250 — position out of bounds or tilt too large).
    pos_threshold: float = 2.0
    angle_threshold: float = 0.3  # rad, on pole roll/pitch
    reward_calc: str = REWARD_FIXED
    # Pixel observations.
    use_raw_pixels: bool = False
    render_width: int = 50
    render_height: int = 50
    num_cameras: int = 1
    # k×k average-pool of each rendered frame INSIDE the render epilogue
    # (render/raycast.py).  The full render still happens at
    # render_height×render_width; pooling shrinks only the observation the
    # rest of the pipeline carries — obs selects, replay writes, policy
    # decode all move k²× fewer bytes, which is where the fused pixel loop's
    # time goes at 4096 envs (BASELINE.md stage table).  1 = reference
    # layout (50×50 frames verbatim).
    obs_pool: int = 1
    # Sub-pixel samples actually shaded per pooled obs pixel (0 = all
    # obs_pool², the exact average of the full-res render).  2 = quincunx
    # antialiasing, 1 = point sampling — the renderer's ray count (its
    # dominant cost) scales linearly with this, at an obs-quality cost.
    obs_samples: int = 0
    # Physics cadence (Bullet default 1/240 s substeps).
    dt: float = 1.0 / 240.0
    # Jacobi contact-solver iterations per substep (physics/solver.py).
    # 3 is the validated round-4 default: it passes every external-fidelity
    # arbiter with margin (topple time identical to the analytic arbiter at
    # 12.5 ms granularity; settle pose within 4 mm of the 30-iteration
    # reference vs the 80 mm MuJoCo agreement bound —
    # tests/test_solver_iters.py), a full-scale DDPG run reaches 194.4/200
    # (runs/ddpg_it3_s0.jsonl), and the on-chip race measured 18.4M vs
    # 15.5M low-dim steps/s (BASELINE.md round-4).  Pass --solver-iters 5
    # for the old conservative setting (tracks a 30-iteration reference to
    # ~2 mm over a 1 s topple+push), still tight-pinned in
    # tests/test_physics.py.
    solver_iterations: int = 3

    def __post_init__(self):
        if self.reward_calc not in REWARD_CALCS:
            raise ValueError(
                f"reward_calc must be one of {REWARD_CALCS}, got {self.reward_calc!r}"
            )
        if self.num_cameras not in (1, 2):
            raise ValueError("num_cameras must be 1 or 2")
        if self.obs_pool < 1 or (
            self.render_height % self.obs_pool
            or self.render_width % self.obs_pool
        ):
            raise ValueError(
                f"obs_pool {self.obs_pool} must divide "
                f"{self.render_height}x{self.render_width}"
            )
        if self.obs_samples < 0 or self.obs_samples > self.obs_pool**2:
            raise ValueError(
                f"obs_samples {self.obs_samples} must be in "
                f"[0, obs_pool²={self.obs_pool ** 2}]"
            )

    # -- observation/action metadata ---------------------------------------
    @property
    def lowdim_obs_shape(self) -> tuple[int, int, int]:
        """(repeats, 2 bodies, 7 pose dims) — reference state layout."""
        return (self.action_repeats, 2, 7)

    @property
    def obs_height(self) -> int:
        """Height of the frames the pipeline carries (post obs_pool)."""
        return self.render_height // self.obs_pool

    @property
    def obs_width(self) -> int:
        return self.render_width // self.obs_pool

    @property
    def pixel_obs_shape(self) -> tuple[int, int]:
        """(repeats, cameras·H'·W'·3) flat RGB, H'/W' = render dims ÷ obs_pool.

        Flat per-frame layout (PLANE-major per camera:
        [cam0 R plane | cam0 G | cam0 B | cam1 R | …], row-major pixels
        within each plane, cameras concatenated)
        — image-shaped observations would be lane-padded 3→128 by TPU tiling
        on every materialization in the fused loop; see render/raycast.py.
        Use render.frame_to_images for host-side viewing.
        """
        return (
            self.action_repeats,
            self.num_cameras * self.obs_height * self.obs_width * 3,
        )

    @property
    def obs_shape(self):
        return self.pixel_obs_shape if self.use_raw_pixels else self.lowdim_obs_shape

    @property
    def num_actions(self) -> int:
        return NUM_DISCRETE_ACTIONS if self.discrete_actions else 2


def add_opts(parser: argparse.ArgumentParser) -> None:
    """Register the reference's env flags (bullet_cartpole.add_opts parity)."""
    parser.add_argument("--action-force", type=float, default=50.0,
                        help="magnitude of cart push force (N)")
    parser.add_argument("--initial-force", type=float, default=55.0,
                        help="magnitude of random push at reset (N)")
    parser.add_argument("--action-repeats", type=int, default=3,
                        help="observation frames captured per env step")
    parser.add_argument("--steps-per-repeat", type=int, default=5,
                        help="physics substeps per observation frame")
    parser.add_argument("--max-episode-len", type=int, default=200,
                        help="episode step cap")
    parser.add_argument("--reward-calc", type=str, default=REWARD_FIXED,
                        choices=list(REWARD_CALCS))
    parser.add_argument("--use-raw-pixels", action="store_true",
                        help="observe 50x50 camera renders instead of poses")
    parser.add_argument("--render-width", type=int, default=50)
    parser.add_argument("--render-height", type=int, default=50)
    parser.add_argument("--num-cameras", type=int, default=1, choices=[1, 2])
    parser.add_argument("--obs-pool", type=int, default=1,
                        help="k×k average-pool rendered frames in the render "
                             "epilogue; the observation (and replay/policy "
                             "input) carries the pooled frames — k² less HBM "
                             "traffic on every obs hop of the fused loop")
    parser.add_argument("--obs-samples", type=int, default=0,
                        help="sub-pixel samples shaded per pooled obs pixel "
                             "(0 = all obs-pool², the exact average; 2 = "
                             "quincunx AA, 1 = point sample — ray count and "
                             "render cost scale linearly)")
    parser.add_argument("--pos-threshold", type=float, default=2.0)
    parser.add_argument("--angle-threshold", type=float, default=0.3)
    parser.add_argument("--solver-iters", type=int, default=3,
                        help="Jacobi contact-solver iterations per physics "
                             "substep.  3 = validated default (round 4: "
                             "passes every fidelity arbiter, full-scale "
                             "DDPG solves at 194/200, measured 18.4M vs "
                             "15.5M low-dim steps/s); 5 = the round-2/3 "
                             "conservative setting")


def config_from_opts(opts: argparse.Namespace, discrete_actions: bool) -> CartpoleConfig:
    """Build a CartpoleConfig from parsed args (agent mains call this)."""
    return CartpoleConfig(
        discrete_actions=discrete_actions,
        action_force=opts.action_force,
        initial_force=opts.initial_force,
        action_repeats=opts.action_repeats,
        steps_per_repeat=opts.steps_per_repeat,
        max_episode_len=opts.max_episode_len,
        reward_calc=opts.reward_calc,
        use_raw_pixels=opts.use_raw_pixels,
        render_width=opts.render_width,
        render_height=opts.render_height,
        num_cameras=opts.num_cameras,
        obs_pool=getattr(opts, "obs_pool", 1),
        obs_samples=getattr(opts, "obs_samples", 0),
        pos_threshold=opts.pos_threshold,
        angle_threshold=opts.angle_threshold,
        solver_iterations=getattr(opts, "solver_iters", 3),
    )
