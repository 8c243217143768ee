"""Renderer registry.

Mirrors the reference's plugin layer (/root/reference/src/renderer.hpp:9-41,
renderer.cpp:11-69): renderers self-register into a process-wide registry
under a unique key (the reference uses ``__FILE__:__LINE__:Type``; here
``module:qualname``), are listed by ``all()``, found by key or exact name,
and the CLI resolves fuzzy prefixes (main.cpp:67-81).

A renderer is a callable ``render(scene, size, key, **opts) -> (H, W, 3)``
float32 radiance image.  ``register_renderer`` is the analogue of the
``REGISTER_RENDERER(T)`` macro (renderer.hpp:34-41).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

__all__ = [
    "Description",
    "install",
    "all_renderers",
    "find_by_key",
    "find_by_name",
    "find_by_name_fuzzy",
    "register_renderer",
    "create",
    "auto_route",
]


@dataclasses.dataclass(frozen=True)
class Description:
    key: str
    name: str
    create: Callable[[], Callable]


_REGISTRY: list[Description] = []


def install(desc: Description) -> None:
    """Idempotent by key (renderer.cpp:21-37)."""
    for d in _REGISTRY:
        if d.key == desc.key:
            return
    _REGISTRY.append(desc)


def all_renderers() -> tuple[Description, ...]:
    return tuple(_REGISTRY)


def find_by_key(key: str) -> Optional[Description]:
    for d in _REGISTRY:
        if d.key == key:
            return d
    return None


def find_by_name(name: str) -> Optional[Description]:
    for d in _REGISTRY:
        if d.name == name:
            return d
    return None


def find_by_name_fuzzy(name: str) -> Optional[Description]:
    """Exact match first, else first registered whose name starts with the
    query (main.cpp:67-81)."""
    if not name:
        return None
    d = find_by_name(name)
    if d is not None:
        return d
    for d in _REGISTRY:
        if d.name.startswith(name):
            return d
    return None


def register_renderer(name: str, factory: Callable[[], Callable]) -> None:
    install(Description(key=f"{factory.__module__}:{name}", name=name, create=factory))


def create(name: str) -> Callable:
    """Create a renderer by (fuzzy) name; raises KeyError if unknown."""
    d = find_by_name_fuzzy(name)
    if d is None:
        raise KeyError(f"no known renderer with name '{name}'")
    return d.create()


def auto_route(scene, platform: str, include_boxes: bool = False) -> tuple:
    """Pick the fastest supported forward path for ``mg_auto``/``sm_auto``.

    Returns ``(route, warning)`` with route in {"pallas", "blockwise",
    "wavefront", "jnp"}; ``warning`` is a message when an accelerator is present but the
    scene forces the (much slower) jnp wavefront — surfaced via
    rt_tpu.log.warn_once so the 10-100x slowdown is never silent."""
    if platform not in ("cpu",):
        from .ops.pallas_blockwise import MAX_BLOCKWISE_PRIMS, blockwise_supported
        from .ops.pallas_render import pallas_supported

        if pallas_supported(scene, include_boxes):
            return "pallas", None
        if blockwise_supported(scene, include_boxes):
            # the bounce-major wavefront overtakes the pixel-major scan
            # once the per-ray primitive scan dominates its sort/state
            # overheads (measured crossover ~2048 padded primitives);
            # wavefront_supported gates anything its kernels cannot
            # render (it covers --boxes since round 5)
            from .ops.pallas_blockwise import _bucket
            from .ops.pallas_wavefront import wavefront_supported

            if (_bucket(scene.spheres.count) >= 2048
                    and wavefront_supported(scene, include_boxes)):
                return "wavefront", None
            return "blockwise", None
        n = scene.spheres.count + scene.planes.count
        why = (f"{n} primitives > {MAX_BLOCKWISE_PRIMS}"
               if n > MAX_BLOCKWISE_PRIMS else
               f"--boxes with {scene.boxes.count} box(es) beyond the "
               "unrolled kernel's cap")
        return "jnp", (
            "auto renderer: scene unsupported by the TPU kernels "
            f"({why}) — falling back to the jnp wavefront "
            "(roughly 20x slower than the megakernel)")
    return "jnp", None


def _install_builtins() -> None:
    from . import integrator

    def _mg():
        def render(scene, size, key, **opts):
            opts.setdefault("personality", "mg")
            return integrator.render_image(scene, size, key, **opts)
        return render

    def _sm():
        def render(scene, size, key, **opts):
            opts.setdefault("personality", "sm")
            return integrator.render_image(scene, size, key, **opts)
        return render

    def _raster():
        return integrator.render_rasterizer

    def _null():
        return integrator.render_null

    def _pallas(personality):
        def factory():
            def render(scene, size, key=None, *, seed: int = 0, **opts):
                from .ops.pallas_render import render_forward_pallas

                opts.pop("rng_mode", None)
                return render_forward_pallas(
                    scene, size, seed=seed, personality=personality, **opts
                )
            return render
        return factory

    # Registration order matches the reference's renderer cycling UX
    # (main.cpp:181-191 iterates registry order).
    register_renderer("mg_ray_tracer", _mg)
    register_renderer("sm_ray_tracer", _sm)
    register_renderer("rasterizer", _raster)
    register_renderer("null_renderer", _null)
    # TPU megakernel fast paths (rt_tpu.ops.pallas_render): same estimator,
    # hardware-PRNG sample streams; falls back with a ValueError on scenes
    # beyond the unroll limits.
    register_renderer("mg_pallas", _pallas("mg"))
    register_renderer("sm_pallas", _pallas("sm"))

    def _blockwise(personality):
        def factory():
            def render(scene, size, key=None, *, seed: int = 0, **opts):
                from .ops.pallas_blockwise import render_forward_blockwise

                return render_forward_blockwise(
                    scene, size, seed=seed, personality=personality, **opts
                )
            return render
        return factory

    # Blockwise megakernel (rt_tpu.ops.pallas_blockwise): dynamic primitive
    # tables streamed through VMEM — big scenes, no recompile on edits.
    register_renderer("mg_blockwise", _blockwise("mg"))
    register_renderer("sm_blockwise", _blockwise("sm"))

    def _wavefront(personality):
        def factory():
            def render(scene, size, key=None, *, seed: int = 0, **opts):
                from .ops.pallas_wavefront import render_forward_wavefront

                return render_forward_wavefront(
                    scene, size, seed=seed, personality=personality, **opts
                )
            return render
        return factory

    # Bounce-major wavefront (rt_tpu.ops.pallas_wavefront): ray
    # compaction + coherence sorting between bounces — the many-thousand-
    # primitive specialist (measured 1.4-1.8x the pixel-major blockwise
    # kernel on the 5000-sphere config-5 slice; SLOWER below ~2048
    # primitives, where per-ray state I/O and sorts outweigh the scan).
    register_renderer("mg_wavefront", _wavefront("mg"))
    register_renderer("sm_wavefront", _wavefront("sm"))

    def _auto(personality):
        def factory():
            def render(scene, size, key=None, *, seed: int = 0, **opts):
                import jax

                route, warning = auto_route(
                    scene, jax.devices()[0].platform,
                    opts.get("include_boxes", False))
                if warning is not None:
                    from .log import warn_once

                    warn_once(("auto", personality, warning), warning)
                if route == "pallas":
                    from .ops.pallas_render import render_forward_pallas

                    opts.pop("rng_mode", None)
                    return render_forward_pallas(
                        scene, size, seed=seed,
                        personality=personality, **opts)
                if route == "blockwise":
                    from .ops.pallas_blockwise import render_forward_blockwise

                    opts.pop("rng_mode", None)
                    return render_forward_blockwise(
                        scene, size, seed=seed,
                        personality=personality, **opts)
                if route == "wavefront":
                    from .ops.pallas_wavefront import render_forward_wavefront

                    opts.pop("rng_mode", None)
                    opts.pop("rng_impl", None)
                    return render_forward_wavefront(
                        scene, size, seed=seed,
                        personality=personality, **opts)
                if key is None:
                    from . import rng

                    key = rng.make_key(seed)
                return integrator.render_image(
                    scene, size, key, personality=personality, **opts)
            return render
        return factory

    # Auto-select: unrolled megakernel for small scenes on TPU, blockwise
    # for big ones, jnp wavefront otherwise (boxes, CPU, >16384 prims).
    register_renderer("mg_auto", _auto("mg"))
    register_renderer("sm_auto", _auto("sm"))


_install_builtins()
