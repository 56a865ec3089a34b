"""Scripted flythrough: replay a WASD/mouse camera trace (BASELINE config 5).

A deterministic re-creation of the reference's interactive loop
(``src/main.cpp:2795-2972``) with input from a script instead of GLFW:

* time: ``timeParam = elapsed * 0.1`` (``src/main.cpp:2799``), movement per
  frame = ``CAMERA_SPEED * timeParamDiff`` per held key
  (``src/main.cpp:2805-2827``);
* mouse deltas are pre-scaled by ``CAMERA_MOUSE_SENSITIVITY`` exactly like
  ``src/main.cpp:2866-2871`` (x negated relative to raw cursor delta);
* per-frame: input → animation step ("TLAS refit") → render.

The same loop serves as the config-5 benchmark: uncapped, wall-clock FPS
reported via the reference-style 1-second window counter.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

from raytpu.camera import Camera, MoveDirection
from raytpu.render import Renderer
from raytpu.scene import Scene
from raytpu.utils import FpsCounter, log

KEYMAP = {
    "w": MoveDirection.FORWARD,
    "s": MoveDirection.BACKWARD,
    "a": MoveDirection.LEFT,
    "d": MoveDirection.RIGHT,
    "e": MoveDirection.UP,
    "q": MoveDirection.DOWN,
}


@dataclasses.dataclass
class ScriptSegment:
    """``duration`` seconds of held ``keys`` + constant mouse velocity
    (raw cursor px/s, scaled by sensitivity like the reference)."""

    duration: float
    keys: str = ""
    mouse_dx: float = 0.0
    mouse_dy: float = 0.0


DEFAULT_SCRIPT: Tuple[ScriptSegment, ...] = (
    ScriptSegment(1.0, "w"),
    ScriptSegment(0.8, "wd", mouse_dx=-120.0),
    ScriptSegment(0.8, "a", mouse_dy=60.0),
    ScriptSegment(0.6, "we"),
    ScriptSegment(0.8, "s", mouse_dx=150.0, mouse_dy=-40.0),
    ScriptSegment(1.0, "wq"),
)


class Flythrough:
    def __init__(
        self,
        scene: Scene,
        script: Sequence[ScriptSegment] = DEFAULT_SCRIPT,
        fps: float = 60.0,
    ):
        self.scene = scene
        self.script = list(script)
        self.frame_dt = 1.0 / fps
        self.renderer = Renderer(scene)
        self.config = scene.config

    def frames(self, device: bool = False):
        """Yield (frame_index, image) replaying the script at fixed virtual
        time steps (deterministic regardless of wall clock).

        ``device=True`` yields device arrays (no host readback) for
        benchmarking/presentation; default yields NumPy for file IO."""
        cam = self.renderer.camera
        sens = self.config.camera_mouse_sensitivity
        speed = self.config.camera_speed
        elapsed = 0.0
        last_time_param = 0.0
        idx = 0
        for seg in self.script:
            n = max(1, int(round(seg.duration / self.frame_dt)))
            for _ in range(n):
                elapsed += self.frame_dt
                time_param = elapsed * 0.1              # src/main.cpp:2799
                dtp = time_param - last_time_param
                last_time_param = time_param
                for key in seg.keys:
                    cam.move(KEYMAP[key], speed * dtp)  # src/main.cpp:2805-2827
                if seg.mouse_dx or seg.mouse_dy:
                    # raw cursor delta this frame → scaled offsets
                    # (sign convention of src/main.cpp:2866-2871)
                    dx = seg.mouse_dx * self.frame_dt
                    dy = seg.mouse_dy * self.frame_dt
                    cam.process_mouse_movement(dx * sens, dy * sens)
                if device:
                    self.renderer.set_transforms(time_param)
                    img = self.renderer.render()
                else:
                    img = self.renderer.step(time_param)
                yield idx, img
                idx += 1

    def run_benchmark(self, max_frames: Optional[int] = None):
        """Replay the script as fast as the device allows; return stats.

        The first frame (compile) is excluded — steady-state numbers, like
        the reference's uncapped TEST_FPS counter after warmup."""
        counter = FpsCounter(print_fn=log.verbose)
        t_start = None
        frame_count = 0
        # device-side frame loop: like the reference's TEST_FPS counter the
        # benchmark measures frame completion, not host readback (a real
        # display path consumes the device buffer directly)
        for idx, img in self.frames(device=True):
            img.block_until_ready()
            if t_start is None:
                t_start = time.perf_counter()  # exclude compile frame
                continue
            counter.frame()
            frame_count += 1
            if max_frames is not None and frame_count >= max_frames:
                break
        wall = time.perf_counter() - t_start
        fps = frame_count / wall if wall > 0 else 0.0
        rays = (
            frame_count
            * self.config.num_pixels
            * self.config.samples_per_pixel
        )
        return {
            "frames": frame_count,
            "wall_s": wall,
            "fps": fps,
            "primary_mrays_per_s": rays / wall / 1e6 if wall > 0 else 0.0,
        }
