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
            # sign convention of src/main.cpp:2866-2871
            cam.process_mouse_movement(
                dx * cfg.camera_mouse_sensitivity,
                dy * cfg.camera_mouse_sensitivity,
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
        if key in KEY_TO_DIR:
            cam.move(KEY_TO_DIR[key], cfg.camera_speed * dtp)

        img = renderer.step(time_param)
        bgr = (np.clip(img, 0, 1)[..., ::-1] * 255).astype(np.uint8)
        cv2.imshow(window_name, bgr)
        if cfg.test_fps:
            fps.frame()
    cv2.destroyAllWindows()
