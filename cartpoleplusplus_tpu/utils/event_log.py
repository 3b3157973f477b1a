"""Trajectory event log: length-prefixed protobuf episode stream + CLI.

Rebuild of the reference's ``event_log.py`` (~180 LoC, SURVEY.md §2.1/§3.5):
``EventLog(path).add_episode(...)`` writes length-prefixed Episode protos;
``read_event_log(path)`` streams them back; the CLI echoes episodes or dumps
renders to PNG files.  This is the repo's trajectory replay/inspection
mechanism and the rebuild's fidelity-harness hook.

Wire format: trajlog record stream (magic + 4-byte little-endian length
prefix per record, see native/trajlog.cpp) where each record is a serialized
Episode proto (schema: utils/event.proto, compiled to event_pb2.py).
Framing IO runs through the native C++ codec when available
(utils/native.py), mirroring the reference's reliance on protobuf's C++
backend for its event logs; a pure-Python path with the identical format is
the fallback.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Iterable, Iterator, Optional, Sequence

import numpy as np

from cartpoleplusplus_tpu.utils import event_pb2
from cartpoleplusplus_tpu.utils.native import RecordWriter, read_records


def _png_encode(rgb: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8/float array to PNG bytes (PIL, host-side)."""
    from PIL import Image  # deferred: PIL is off the hot path

    arr = np.asarray(rgb)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    import io

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def make_event(
    cart_pose: np.ndarray,
    pole_pose: np.ndarray,
    action,
    reward: float,
    done: bool,
    renders: Optional[Sequence[np.ndarray]] = None,
    velocities: Optional[np.ndarray] = None,
) -> event_pb2.Event:
    """Build one Event proto from (7,) poses [pos(3) + quat wxyz(4)].

    ``velocities``: optional (2, 6) [body, (linear(3), angular(3))] — enables
    exact re-simulation by the fidelity harness (utils/fidelity.py).
    """
    ev = event_pb2.Event()
    cart_pose = np.asarray(cart_pose, np.float32)
    pole_pose = np.asarray(pole_pose, np.float32)
    ev.cart.position.extend(cart_pose[:3].tolist())
    ev.cart.orientation.extend(cart_pose[3:7].tolist())
    ev.pole.position.extend(pole_pose[:3].tolist())
    ev.pole.orientation.extend(pole_pose[3:7].tolist())
    if velocities is not None:
        velocities = np.asarray(velocities, np.float32)
        ev.cart.linear_velocity.extend(velocities[0, :3].tolist())
        ev.cart.angular_velocity.extend(velocities[0, 3:6].tolist())
        ev.pole.linear_velocity.extend(velocities[1, :3].tolist())
        ev.pole.angular_velocity.extend(velocities[1, 3:6].tolist())
    ev.action.extend(np.atleast_1d(np.asarray(action, np.float32)).tolist())
    ev.reward = float(reward)
    ev.done = bool(done)
    for r in renders or ():
        ev.render.append(_png_encode(r))
    return ev


class EventLog:
    """Streaming episode writer (reference EventLog.add_episode)."""

    def __init__(self, path: str):
        self._writer = RecordWriter(path)

    def add_episode(self, events: Iterable[event_pb2.Event]) -> None:
        ep = event_pb2.Episode()
        for ev in events:
            ep.event.append(ev)
        self._writer.write(ep.SerializeToString())
        self._writer.flush()

    def close(self):
        self._writer.close()


def read_event_log(path: str) -> Iterator[event_pb2.Episode]:
    """Stream episodes back (reference read_event_log generator)."""
    for data in read_records(path):
        ep = event_pb2.Episode()
        ep.ParseFromString(data)
        yield ep


def index_event_log(path: str) -> list[int]:
    """Byte offsets of every episode record (native one-pass header scan).

    Also an integrity check: raises on a truncated tail from a crashed
    writer.  Feed an offset to :func:`read_episode_at` for O(1) access —
    pixel logs are multi-MB per episode, so selecting episode N this way
    skips decoding everything before it.
    """
    from cartpoleplusplus_tpu.utils.native import scan_records

    return scan_records(path)


def read_episode_at(path: str, offset: int) -> event_pb2.Episode:
    """Decode the single episode whose record starts at ``offset``."""
    from cartpoleplusplus_tpu.utils.native import read_record_at

    ep = event_pb2.Episode()
    ep.ParseFromString(read_record_at(path, offset))
    return ep


def episode_poses(ep: event_pb2.Episode) -> np.ndarray:
    """Episode → (T, 2, 7) pose array for the fidelity harness."""
    out = np.zeros((len(ep.event), 2, 7), np.float32)
    for t, ev in enumerate(ep.event):
        out[t, 0] = list(ev.cart.position) + list(ev.cart.orientation)
        out[t, 1] = list(ev.pole.position) + list(ev.pole.orientation)
    return out


def episode_frames(
    ep: event_pb2.Episode,
    width: int = 120,
    height: int = 120,
    num_cameras: int = 1,
) -> Iterator[np.ndarray]:
    """Yield one (H, W·cams, 3) uint8 image per event of an episode.

    Stored renders (PNG bytes in ``Event.render``) are decoded directly;
    episodes recorded WITHOUT renders (low-dim runs) are re-rendered from the
    logged poses through the ray caster — the same visual-inspection loop the
    reference got from Bullet's ``--gui`` window (SURVEY.md §4 row 1), but
    reproducible offline from any event log.
    """
    import io

    from PIL import Image  # host tool; PIL off the hot path

    renderer = None
    for ev in ep.event:
        if ev.render:
            imgs = [
                np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
                for png in ev.render
            ]
        else:
            if renderer is None:
                renderer = _pose_renderer(width, height, num_cameras)
            imgs = renderer(
                list(ev.cart.position) + list(ev.cart.orientation),
                list(ev.pole.position) + list(ev.pole.orientation),
            )
        yield np.concatenate(imgs, axis=1) if len(imgs) > 1 else imgs[0]


def _pose_renderer(width: int, height: int, num_cameras: int):
    """(cart_pose7, pole_pose7) → [per-camera (H, W, 3) uint8] via raycast."""
    import jax.numpy as jnp

    from cartpoleplusplus_tpu.physics.bodies import RigidState, make_scene
    from cartpoleplusplus_tpu.render.camera import DEFAULT_CAMERAS, ray_grid
    from cartpoleplusplus_tpu.render.raycast import render_rays

    scene = make_scene()
    grids = [
        ray_grid(cam, height, width)
        for cam in DEFAULT_CAMERAS[: max(num_cameras, 1)]
    ]

    def render(cart_pose, pole_pose):
        cart = np.asarray(cart_pose, np.float32)
        pole = np.asarray(pole_pose, np.float32)
        rigid = RigidState(
            pos=jnp.asarray(np.stack([cart[:3], pole[:3]])),
            quat=jnp.asarray(np.stack([cart[3:7], pole[3:7]])),
            vel=jnp.zeros((2, 3), jnp.float32),
            ang=jnp.zeros((2, 3), jnp.float32),
        )
        out = []
        for dirs, eye in grids:
            rgb = np.asarray(render_rays(scene, rigid, eye, dirs))
            img = (np.clip(rgb, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
            out.append(img.reshape(height, width, 3))
        return out

    return render


def write_episode_gif(
    ep: event_pb2.Episode,
    path: str,
    fps: int = 10,
    scale: int = 4,
    width: int = 120,
    height: int = 120,
    num_cameras: int = 1,
) -> int:
    """Render an episode to an animated GIF; returns the frame count."""
    from PIL import Image

    frames = []
    for img in episode_frames(ep, width, height, num_cameras):
        pil = Image.fromarray(img)
        if scale > 1:
            pil = pil.resize(
                (pil.width * scale, pil.height * scale), Image.NEAREST
            )
        frames.append(pil)
    if not frames:
        return 0
    frames[0].save(
        path,
        save_all=True,
        append_images=frames[1:],
        duration=max(int(1000 / max(fps, 1)), 1),
        loop=0,
    )
    return len(frames)


def main(argv=None):
    """CLI parity with the reference: --echo / --img-output-dir, plus
    --gif-out for one-command visual inspection (episode → animated GIF)."""
    parser = argparse.ArgumentParser(description="inspect cartpole++ event logs")
    parser.add_argument("--log-file", required=True)
    parser.add_argument("--echo", action="store_true",
                        help="print per-episode summaries")
    parser.add_argument("--img-output-dir", type=str, default=None,
                        help="decode renders to PNGs under this dir")
    parser.add_argument("--gif-out", type=str, default=None,
                        help="write one animated GIF per episode under this "
                             "dir (re-renders from poses when the log has no "
                             "stored frames)")
    parser.add_argument("--gif-fps", type=int, default=10)
    parser.add_argument("--gif-scale", type=int, default=4,
                        help="nearest-neighbor upscale factor")
    parser.add_argument("--gif-size", type=int, default=120,
                        help="re-render resolution (square) for logs without "
                             "stored frames")
    parser.add_argument("--gif-cameras", type=int, default=1,
                        help="cameras for re-rendered GIFs (stored-frame "
                             "GIFs show every logged camera)")
    parser.add_argument("--episode", type=int, default=None,
                        help="operate on this episode only (O(1) seek via "
                             "the native header scan — no decoding of "
                             "earlier episodes)")
    parser.add_argument("--verify", action="store_true",
                        help="scan the whole log's framing and report the "
                             "episode count; fails on a truncated tail")
    opts = parser.parse_args(argv)

    if opts.verify:
        offsets = index_event_log(opts.log_file)
        print(f"{opts.log_file}: {len(offsets)} episodes, framing OK")
        if not (opts.echo or opts.img_output_dir or opts.gif_out):
            return

    if opts.episode is not None:
        offsets = index_event_log(opts.log_file)
        if not 0 <= opts.episode < len(offsets):
            raise SystemExit(
                f"--episode {opts.episode} out of range (log has "
                f"{len(offsets)} episodes)"
            )
        episodes = [
            (opts.episode, read_episode_at(opts.log_file, offsets[opts.episode]))
        ]
    else:
        episodes = enumerate(read_event_log(opts.log_file))

    for i, ep in episodes:
        total_r = sum(ev.reward for ev in ep.event)
        if opts.echo:
            print(f"episode {i}: {len(ep.event)} events, total_reward={total_r}")
            for t, ev in enumerate(ep.event):
                print(
                    f"  t={t} cart={tuple(round(v, 3) for v in ev.cart.position)}"
                    f" pole={tuple(round(v, 3) for v in ev.pole.position)}"
                    f" action={tuple(ev.action)} r={ev.reward} done={ev.done}"
                )
        if opts.img_output_dir:
            os.makedirs(opts.img_output_dir, exist_ok=True)
            for t, ev in enumerate(ep.event):
                for c, png in enumerate(ev.render):
                    path = os.path.join(
                        opts.img_output_dir, f"ep{i:05d}_t{t:04d}_cam{c}.png"
                    )
                    with open(path, "wb") as f:
                        f.write(png)
        if opts.gif_out:
            os.makedirs(opts.gif_out, exist_ok=True)
            path = os.path.join(opts.gif_out, f"ep{i:05d}.gif")
            n = write_episode_gif(
                ep, path, fps=opts.gif_fps, scale=opts.gif_scale,
                width=opts.gif_size, height=opts.gif_size,
                num_cameras=opts.gif_cameras,
            )
            print(f"wrote {path} ({n} frames)", file=sys.stderr)
    if not (opts.echo or opts.img_output_dir or opts.gif_out):
        print("nothing to do: pass --echo, --img-output-dir and/or --gif-out",
              file=sys.stderr)


if __name__ == "__main__":
    main()
