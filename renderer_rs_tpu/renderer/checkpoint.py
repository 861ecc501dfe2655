"""Checkpoint / resume: scene-state serialization.

The reference has NO state serialization (serde declared but unused,
SURVEY.md §5 "Checkpoint/resume"); screenshots are manual artifacts. Here
scene pytrees are flat arrays, so checkpointing is trivial:

- save_scene/load_scene: the full GpuScene pytree (+ the static SceneLayout)
  round-trips through one .npz file — a render session can resume with
  bit-identical state.
- Framebuffer PNG dumps (the screenshot/golden mechanism) live in
  platform.Surface / utils.image_io.
"""

from __future__ import annotations

import dataclasses
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np

from renderer_rs_tpu.renderer.scene_build import GpuScene, SceneLayout

log = logging.getLogger("renderer_rs_tpu.renderer.checkpoint")


def save_scene(path: str, scene: GpuScene, layout: SceneLayout) -> None:
    """Serialize scene pytree + static layout to an .npz checkpoint."""
    leaves, treedef = jax.tree.flatten(scene)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {
        "layout": dataclasses.asdict(layout),
        "treedef": str(treedef),  # structural fingerprint for mismatch checks
        "num_leaves": len(leaves),
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)
    log.info("scene checkpoint saved: %s (%d leaves)", path, len(leaves))


def load_scene(path: str, reference_scene: GpuScene) -> tuple[GpuScene, SceneLayout]:
    """Restore a checkpoint. `reference_scene` supplies the pytree structure
    (build the same scene shape, then load state into it)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    leaves, treedef = jax.tree.flatten(reference_scene)
    if meta["num_leaves"] != len(leaves):
        raise ValueError(
            f"checkpoint has {meta['num_leaves']} leaves, scene has {len(leaves)}"
        )
    if meta["treedef"] != str(treedef):
        raise ValueError("checkpoint pytree structure does not match the scene")
    restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    for i, (ref, got) in enumerate(zip(leaves, restored)):
        if jnp.shape(ref) != got.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {got.shape} != scene {jnp.shape(ref)}"
            )
    scene = jax.tree.unflatten(treedef, restored)
    ld = meta["layout"]
    ld["object_ranges"] = tuple(tuple(r) for r in ld["object_ranges"])
    ld["texture_slots"] = tuple(ld["texture_slots"])
    if "material_constants" in ld:
        ld["material_constants"] = tuple(ld["material_constants"])
    layout = SceneLayout(**ld)
    log.info("scene checkpoint loaded: %s", path)
    return scene, layout
