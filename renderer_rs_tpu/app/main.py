"""Headless app entry point (≙ crates/app/src/main.rs).

The reference's winit event loop (resumed -> create window+renderer;
RedrawRequested -> timer.tick + render_frame; continuous redraw via
about_to_wait, main.rs:35-105) becomes a headless frame loop: no display
server exists, so "present" writes PNGs / keeps the last frame, and input
events are scripted — --orbit injects a left-button drag + scroll stream
into InputState driving an OrbitController; --fly holds W + mouse-look
driving an FpsController (≙ main.rs:61-104 winit event wiring).

Usage:
    python -m renderer_rs_tpu.app.main --scene triangle --frames 1 --out /tmp/out
    python -m renderer_rs_tpu.app.main --scene full --width 1920 --height 1080
    python -m renderer_rs_tpu.app.main --scene blinnphong --frames 8 --orbit
"""

from __future__ import annotations

import argparse
import logging
import math

from renderer_rs_tpu.core import Timer, init_logging
from renderer_rs_tpu.core.config import RendererConfig
from renderer_rs_tpu.platform.input import InputState, KeyCode, MouseButton
from renderer_rs_tpu.platform.window import Window
from renderer_rs_tpu.renderer.renderer import Renderer

log = logging.getLogger("renderer_rs_tpu.app")


def inject_scripted_events(inp: InputState, mode: str, frame: int) -> None:
    """Per-frame scripted event stream standing in for winit callbacks
    (≙ the user dragging/flying; app/src/main.rs:61-97)."""
    if mode == "orbit":
        if frame == 0:
            inp.on_mouse_move(400.0, 300.0)  # anchor (no delta on first)
            inp.on_mouse_press(MouseButton.LEFT)
        inp.on_mouse_move(400.0 + 8.0 * (frame + 1), 300.0 + 2.0 * (frame + 1))
        if frame % 16 == 8:
            inp.on_scroll(1.0)
    elif mode == "fly":
        if frame == 0:
            inp.on_mouse_move(400.0, 300.0)
            inp.on_key_press(KeyCode.KEY_W)
        inp.on_mouse_move(400.0 + 25.0 * (frame + 1), 300.0 + 5.0 * (frame + 1))


def apply_camera_input(inp: InputState, mode: str, controller, camera, dt: float) -> None:
    """InputState -> controller -> Camera (≙ the reference's intended
    controller wiring, crates/scene/src/camera.rs:287-326, 451-507)."""
    if mode == "orbit":
        if inp.is_mouse_pressed(MouseButton.LEFT):
            controller.process_mouse_movement(*inp.mouse_delta)
        if inp.scroll_delta:
            controller.process_zoom(inp.scroll_delta)
        controller.update_camera(camera)
    else:
        controller.process_mouse_movement(*inp.mouse_delta)
        key = inp.is_key_pressed
        forward = float(key(KeyCode.KEY_W)) - float(key(KeyCode.KEY_S))
        right = float(key(KeyCode.KEY_D)) - float(key(KeyCode.KEY_A))
        up = float(key(KeyCode.SPACE)) - float(key(KeyCode.SHIFT_LEFT))
        controller.set_movement_input(forward, right, up)
        controller.update_camera(camera, dt)


def build(args):
    from renderer_rs_tpu.app.scenes import SCENES, full_scene, gltf_pbr_scene

    if args.scene == "gltf-pbr" and args.gltf:
        return gltf_pbr_scene(args.width, args.height, args.gltf)
    if args.scene == "full":
        return full_scene(
            args.width, args.height, tri_budget=args.tris, csm=args.csm,
            textured=args.textured, hdr=args.hdr, gltf=args.gltf,
        )
    return SCENES[args.scene](args.width, args.height)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="renderer_rs_tpu headless app")
    parser.add_argument("--scene", choices=["triangle", "cube", "blinnphong", "gltf-pbr", "full"],
                        default="triangle")
    parser.add_argument("--width", type=int, default=1280)  # ≙ main.rs:38
    parser.add_argument("--height", type=int, default=720)
    parser.add_argument("--frames", type=int, default=1)
    parser.add_argument("--out", type=str, default=None, help="PNG output directory")
    parser.add_argument("--gltf", type=str, default=None, help="glTF path (gltf-pbr scene, or instanced into the full scene)")
    parser.add_argument("--tris", type=int, default=100_000,
                        help="triangle budget for the full scene")
    parser.add_argument("--csm", action="store_true",
                        help="cascaded shadow maps (full scene)")
    parser.add_argument("--textured", action="store_true",
                        help="bind the 5-slot procedural PBR texture set (full scene)")
    parser.add_argument("--hdr", type=str, default=None,
                        help="Radiance .hdr equirect environment for the full scene's IBL")
    parser.add_argument("--backend", type=str, default=None, help="jax platform override")
    parser.add_argument("--log", type=str, default=None, help="log filter (RUST_LOG style)")
    parser.add_argument("--orbit", action="store_true",
                        help="scripted orbit-drag camera (OrbitController)")
    parser.add_argument("--fly", action="store_true",
                        help="scripted fly-forward camera (FpsController)")
    args = parser.parse_args(argv)

    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)

    init_logging(args.log)
    from renderer_rs_tpu.core.config import ensure_f32_matmuls

    ensure_f32_matmuls()
    # a real display gets a real window (X11 blit via ctypes); otherwise the
    # surface is the PNG/array sink (≙ winit window vs headless capture)
    x11 = None
    sink = args.out
    if sink is None:
        from renderer_rs_tpu.platform.x11 import X11Window, display_available

        if display_available():
            try:
                x11 = X11Window(
                    args.width, args.height, f"renderer_rs_tpu [{args.scene}]"
                )
                sink = x11.present
            except Exception as e:  # display may be unreachable
                log.warning("X11 window unavailable (%s); offscreen", e)
    window = Window(args.width, args.height, f"renderer_rs_tpu [{args.scene}]", sink=sink)
    scene, layout, kwargs, animate = build(args)
    camera = kwargs.get("camera")
    renderer = Renderer(
        window, RendererConfig(width=args.width, height=args.height), **kwargs
    )
    renderer.set_scene(scene, layout)
    if x11 is not None:
        # WM resize -> deferred swapchain/frame-fn recreate (≙ Resized arm,
        # app/src/main.rs:67-75; renderer.resize also resizes the Window)
        x11.on_resize = renderer.resize

    ctl_mode = "orbit" if args.orbit else ("fly" if args.fly else None)
    controller = None
    if ctl_mode and camera is None:
        log.warning("--%s ignored: the %s scene has no camera", ctl_mode, args.scene)
        ctl_mode = None
    elif ctl_mode == "orbit":
        from renderer_rs_tpu.scene.camera import OrbitController

        controller = OrbitController()
        controller.sync_with_camera(camera, (0.0, 0.0, 0.0))
    elif ctl_mode == "fly":
        from renderer_rs_tpu.scene.camera import FpsController

        controller = FpsController()
        controller.sync_with_camera(camera)

    input_state = InputState()
    timer = Timer()  # ≙ app timer (main.rs:77)
    t = 0.0
    for frame in range(args.frames):
        input_state.begin_frame()  # ≙ about_to_wait (main.rs:99-104)
        if x11 is not None:
            # live input: real X key/button/motion events drive InputState
            # (≙ winit KeyboardInput/MouseInput arms, app/src/main.rs:85-97)
            if not x11.pump_events(input_state):
                log.info("window closed")
                break
        elif ctl_mode:
            inject_scripted_events(input_state, ctl_mode, frame)
        dt = timer.tick()
        t += dt if frame > 0 else 0.0
        if ctl_mode:
            # hitch clamp: a compile/IO stall must not teleport the camera
            # (standard game-loop guard; the first frame's dt includes the
            # XLA compile, which can be tens of seconds on this backend)
            apply_camera_input(
                input_state, ctl_mode, controller, camera, min(dt, 0.1)
            )
            renderer.update_camera(camera)
        if animate is not None:
            renderer.update_scene(animate(renderer._scene, t, dt))
        renderer.render_frame()
    # drain the in-flight queue so every frame is presented
    for fb in renderer.frame_manager.wait_for_all_frames():
        from renderer_rs_tpu.utils.image_io import framebuffer_to_u8

        window.create_surface().present(framebuffer_to_u8(fb))
    renderer.wait_idle()
    elapsed = timer.elapsed()
    log.info(
        "%d frames in %.2fs (%.1f FPS incl. compile); steady-state %s",
        args.frames,
        elapsed,
        args.frames / max(elapsed, 1e-9),
        renderer.stats.summary(),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
