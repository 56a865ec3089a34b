from raytpu.frontend.headless import render_sequence, render_still
from raytpu.frontend.flythrough import (
    DEFAULT_SCRIPT,
    Flythrough,
    ScriptSegment,
)

__all__ = [
    "DEFAULT_SCRIPT",
    "Flythrough",
    "ScriptSegment",
    "render_sequence",
    "render_still",
]
