"""Terminal viewer: the window/event-loop layer without SDL.

The reference hosts renderers in an SDL window with FPS-style controls and
a low-res preview while the camera moves (/root/reference/src/window.cpp,
main.cpp:177-322).  A TPU pod has no display, so this module renders to the
terminal with ANSI truecolor half-blocks and reproduces the interaction
model:

* WASD + space/c to move, arrow keys to yaw/pitch (main.cpp:177-232 uses
  RMB drag; keys here), q/ESC to quit.
* '+'/'-' cycle the registered renderers (main.cpp:181-191).
* 'r' reloads the scene; the file's mtime is also polled every 0.5 s
  (main.cpp:235-254); a failed reload keeps the previous scene
  (main.cpp:127-132).  The camera pose is preserved across reloads
  (main.cpp:110-117).
* While moving, frames come from the rasterizer at reduced resolution;
  0.5 s after the last movement a full-quality frame is rendered
  (main.cpp:305-311, window.cpp:54-64's low-res back buffer).
"""

from __future__ import annotations

import os
import select
import sys
import time

import numpy as np

__all__ = ["ansi_preview", "print_preview", "interactive"]


def ansi_preview(img, max_width: int = 100) -> str:
    """Render a float (H, W, 3) image as ANSI truecolor half-blocks.

    Each character cell shows two vertically stacked pixels (▀ with
    foreground = upper pixel, background = lower pixel).
    """
    img = np.asarray(img)
    h, w = img.shape[:2]
    step = max(1, -(-w // max_width))
    small = img[::step, ::step, :3]
    if small.shape[0] % 2:
        small = np.concatenate([small, np.zeros((1,) + small.shape[1:], small.dtype)])
    q = np.clip(small * 255.99999, 0, 255).astype(np.int32)
    lines = []
    for y in range(0, q.shape[0], 2):
        row = []
        for x in range(q.shape[1]):
            tr, tg, tb = q[y, x]
            br, bg, bb = q[y + 1, x]
            row.append(f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg};{bb}m▀")
        lines.append("".join(row) + "\x1b[0m")
    return "\n".join(lines)


def print_preview(img, max_width: int = 100) -> None:
    print(ansi_preview(img, max_width))


class _RawTerm:
    """cbreak-mode stdin for single-key reads (no-op when not a tty)."""

    def __enter__(self):
        self.enabled = sys.stdin.isatty()
        if self.enabled:
            import termios
            import tty

            self.fd = sys.stdin.fileno()
            self.old = termios.tcgetattr(self.fd)
            tty.setcbreak(self.fd)
        return self

    def __exit__(self, *exc):
        if self.enabled:
            import termios

            termios.tcsetattr(self.fd, termios.TCSADRAIN, self.old)

    def get_key(self, timeout: float = 0.05):
        if not self.enabled:
            time.sleep(timeout)
            return None
        r, _, _ = select.select([sys.stdin], [], [], timeout)
        if not r:
            return None
        ch = sys.stdin.read(1)
        if ch == "\x1b":  # arrow keys: ESC [ A/B/C/D
            r, _, _ = select.select([sys.stdin], [], [], 0.01)
            if r:
                seq = sys.stdin.read(2)
                return {"[A": "up", "[B": "down", "[C": "right", "[D": "left"}.get(seq, "esc")
            return "esc"
        return ch


def interactive(
    scene_path: str = "",
    renderer_name: str = "mg",
    *,
    size: tuple[int, int] = (192, 108),
    spp: int | None = None,
    seed: int = 0,
    move_speed: float = 1.5,
    turn_speed: float = 0.15,
    low_res_scale: float = 0.33,
    confirm_reload: bool = True,
):
    """Interactive terminal loop (the reference's `run()` without SDL).

    ``confirm_reload``: when the scene file changes on disk, show a
    reload-confirmation prompt instead of reloading silently — the
    terminal analogue of the reference's ImGui "scene file has changed,
    reload?" dialog (main.cpp:251-263); 'y' (or 'r') reloads with the
    camera preserved, 'n' dismisses until the next change."""
    import dataclasses

    import jax.numpy as jnp

    import rt_tpu
    from rt_tpu import renderer as registry
    from rt_tpu.camera import rotate_pitch, rotate_yaw

    def load():
        if scene_path:
            return rt_tpu.load(scene_path)
        return rt_tpu.load_first_available()

    scene = load()
    names = [d.name for d in registry.all_renderers()]
    try:
        r_idx = names.index(registry.find_by_name_fuzzy(renderer_name).name)
    except AttributeError:
        raise SystemExit(f"no known renderer with name '{renderer_name}'")
    render = registry.all_renderers()[r_idx].create()
    raster = registry.create("rasterizer")
    key = rt_tpu.rng.make_key(seed)

    last_move = 0.0
    last_mtime_check = 0.0
    mtime = os.path.getmtime(scene.path) if scene.path else None
    dirty = True
    full_quality_pending = False
    reload_prompt = False

    def update_title():
        # terminal-title status line (the reference's window title carries
        # "rt - <scene> - <renderer>", main.cpp:154-163; OSC 0 is the
        # terminal analogue)
        parts = ["rt"]
        if scene.path:
            parts.append(scene.path)
        parts.append(names[r_idx])
        sys.stdout.write("\x1b]0;" + " - ".join(parts) + "\x07")
        sys.stdout.flush()

    def draw(low_res: bool):
        if low_res:
            small = (max(int(size[0] * low_res_scale), 16),
                     max(int(size[1] * low_res_scale), 9))
            img = np.asarray(raster(scene, small, key))
        else:
            opts = {} if spp is None else {"spp": spp}
            img = np.asarray(render(scene, size, key, **opts))
        sys.stdout.write("\x1b[H\x1b[2J")
        print_preview(img, max_width=size[0] // 2)
        update_title()
        print(f"[{names[r_idx]}] {scene.path or '<default>'}  "
              "wasd/space/c move, arrows look, +/- renderer, r reload, q quit")
        if reload_prompt:
            print("scene file has changed on disk — reload? [y/n]")

    with _RawTerm() as term:
        while True:
            now = time.monotonic()
            if dirty:
                low = (now - last_move) < 0.5 and last_move > 0
                draw(low)
                full_quality_pending = low
                dirty = False
            elif full_quality_pending and (now - last_move) >= 0.5:
                draw(False)
                full_quality_pending = False

            # scene hot-reload poll (main.cpp:235-249)
            if scene.path and now - last_mtime_check > 0.5:
                last_mtime_check = now
                try:
                    m = os.path.getmtime(scene.path)
                except OSError:
                    m = mtime
                if m != mtime:
                    mtime = m
                    if confirm_reload:
                        reload_prompt = True
                        dirty = True
                    else:
                        try:
                            cam = scene.camera
                            scene = load()
                            scene = dataclasses.replace(scene, camera=cam)
                            dirty = True
                        except Exception as ex:
                            print(f"error: {ex}")

            k = term.get_key()
            if k is None:
                continue
            cam = scene.camera
            moved = False
            if k in ("q", "esc"):
                break
            elif k in "wasd c":
                fwd, rgt, up = cam.forward, cam.right, jnp.array([0.0, 1.0, 0.0])
                delta = {"w": fwd, "s": -fwd, "a": -rgt, "d": rgt,
                         " ": up, "c": -up}.get(k)
                if delta is not None:
                    cam = dataclasses.replace(cam, position=cam.position + move_speed * delta)
                    moved = True
            elif k in ("left", "right"):
                ang = turn_speed if k == "left" else -turn_speed
                cam = dataclasses.replace(cam, rotation=rotate_yaw(cam.rotation, ang))
                moved = True
            elif k in ("up", "down"):
                ang = turn_speed if k == "up" else -turn_speed
                cam = dataclasses.replace(cam, rotation=rotate_pitch(cam.rotation, ang))
                moved = True
            elif k == "+":
                r_idx = (r_idx + 1) % len(names)
                render = registry.all_renderers()[r_idx].create()
                dirty = True
            elif k == "-":
                r_idx = (r_idx - 1) % len(names)
                render = registry.all_renderers()[r_idx].create()
                dirty = True
            elif k == "r" or (reload_prompt and k in ("y", "Y")):
                reload_prompt = False
                try:
                    c = scene.camera
                    scene = dataclasses.replace(load(), camera=c)
                    dirty = True
                except Exception as ex:
                    print(f"error: {ex}")
            elif reload_prompt and k in ("n", "N"):
                reload_prompt = False
                dirty = True
            if moved:
                scene = dataclasses.replace(scene, camera=cam)
                last_move = time.monotonic()
                dirty = True
    print("bye")
