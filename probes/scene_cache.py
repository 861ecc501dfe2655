"""Disk cache of the built 1080p/100k flagship scene for TPU probes."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

PATH = "/tmp/full_scene_1080_100k.pkl"


def get_full_scene():
    if os.path.exists(PATH):
        with open(PATH, "rb") as f:
            blob = pickle.load(f)
        scene = jax.tree.unflatten(
            pickle.loads(blob["treedef"]),
            [jnp.asarray(a) for a in blob["leaves"]],
        )
        return scene, blob["layout"], blob["kwargs"]
    from renderer_rs_tpu.app.scenes import full_scene

    scene, layout, kwargs, _ = full_scene(1920, 1080, tri_budget=100_000)
    leaves, treedef = jax.tree.flatten(scene)
    kwargs.pop("camera", None)
    with open(PATH, "wb") as f:
        pickle.dump(
            {
                "leaves": [np.asarray(x) for x in leaves],
                "treedef": pickle.dumps(treedef),
                "layout": layout,
                "kwargs": kwargs,
            },
            f,
        )
    return scene, layout, kwargs
