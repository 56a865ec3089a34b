"""Interactive windowed frontend (WASD + mouse fly camera).

The analog of the reference's GLFW loop (``src/main.cpp:2795-2972``,
callbacks ``:83-110``): poll input → move camera → animate instances →
render → present. Presentation uses OpenCV's HighGUI when a display is
available (this container has cv2 but usually no X server — the frontend
degrades gracefully and tells the user to use the headless/flythrough
frontends instead).

Controls (matching the reference key map, ``src/main.cpp:2804-2830``):
W/A/S/D move, E up, Q down, right-drag to look, ESC quits.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from raytpu.camera import Camera, MoveDirection
from raytpu.render import Renderer
from raytpu.scene import Scene
from raytpu.utils import FpsCounter, log

KEY_TO_DIR = {
    ord("w"): MoveDirection.FORWARD,
    ord("s"): MoveDirection.BACKWARD,
    ord("a"): MoveDirection.LEFT,
    ord("d"): MoveDirection.RIGHT,
    ord("e"): MoveDirection.UP,
    ord("q"): MoveDirection.DOWN,
}


def mouse_look_offsets(dx: float, dy: float, sensitivity: float):
    """Cursor delta → (xoffset, yoffset) for Camera.process_mouse_movement.

    Matches the reference's convention exactly (``src/main.cpp:2863-2877``):
    ``mouseDifferenceX/Y = previous - current`` and the camera is fed
    ``(-mouseDifferenceX, mouseDifferenceY) * sensitivity`` — i.e. dragging
    right looks right (+dx) and dragging DOWN pitches DOWN (-dy)."""
    return dx * sensitivity, -dy * sensitivity


class HeldKeys:
    """Best-effort key-state tracking over cv2's one-key-per-frame events.

    The reference keeps a GLFW key-state array so W+D+Q all apply each frame
    (``src/main.cpp:28,83-93,2804-2827``). cv2.waitKey delivers only one
    keycode per poll and no key-up events, so true chords are impossible;
    this emulates "held" state by keeping each seen key active for
    ``hold_frames`` polls — OS key-repeat alternating between held keys then
    applies all of them nearly every frame. Scripted flythroughs support
    exact chords (e.g. ``"wd"``)."""

    def __init__(self, hold_frames: int = 6):
        self.hold_frames = hold_frames
        self._until = {}
        self._frame = 0

    def poll(self, key: int):
        """Record this frame's key event (-1/255 = none); returns the set
        of currently-held keycodes."""
        self._frame += 1
        if key in KEY_TO_DIR:
            self._until[key] = self._frame + self.hold_frames
        return {k for k, f in self._until.items() if f > self._frame}


def run_interactive(scene: Scene, window_name: str = "raytpu") -> None:
    try:
        import cv2
    except ImportError:
        log.fail(
            "interactive frontend needs OpenCV (cv2); use "
            "`python -m raytpu.cli flythrough` or `render` for headless output"
        )

    renderer = Renderer(scene)
    cfg = scene.config
    cam = renderer.camera
    fps = FpsCounter(print_fn=log.info)

    mouse_state = {"down": False, "last": None}
    keys = HeldKeys()

    def on_mouse(event, x, y, flags, param):
        # RMB-drag look, like mouseButtonCallback (src/main.cpp:95-110)
        if event == cv2.EVENT_RBUTTONDOWN:
            mouse_state["down"] = True
            mouse_state["last"] = (x, y)
        elif event == cv2.EVENT_RBUTTONUP:
            mouse_state["down"] = False
        elif event == cv2.EVENT_MOUSEMOVE and mouse_state["down"]:
            lx, ly = mouse_state["last"]
            dx, dy = x - lx, y - ly
            mouse_state["last"] = (x, y)
            cam.process_mouse_movement(
                *mouse_look_offsets(dx, dy, cfg.camera_mouse_sensitivity)
            )

    try:
        cv2.namedWindow(window_name)
        cv2.setMouseCallback(window_name, on_mouse)
    except cv2.error as e:
        log.fail(
            f"no display available ({e}); use the headless or flythrough "
            "frontend instead"
        )

    t_start = time.perf_counter()
    last_time_param = 0.0
    log.info("interactive: WASD move, E/Q up/down, right-drag look, ESC quit")
    while True:
        elapsed = time.perf_counter() - t_start
        time_param = elapsed * 0.1  # src/main.cpp:2799
        dtp = time_param - last_time_param
        last_time_param = time_param

        key = cv2.waitKey(1) & 0xFF
        if key == 27:  # ESC (src/main.cpp:2828-2830)
            break
        for held in keys.poll(key):
            cam.move(KEY_TO_DIR[held], cfg.camera_speed * dtp)

        img = renderer.step(time_param)
        bgr = (np.clip(img, 0, 1)[..., ::-1] * 255).astype(np.uint8)
        cv2.imshow(window_name, bgr)
        if cfg.test_fps:
            fps.frame()
    cv2.destroyAllWindows()
