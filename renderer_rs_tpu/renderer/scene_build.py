"""Scene building: host-side assembly of the device scene pytree.

The reference binds per-object descriptor sets and issues one draw per mesh
(the per-draw hot loop, renderer.rs:535-538). TPU-first, all meshes are
concatenated into single SoA vertex/index buffers at build time, with

- a static `SceneLayout` (hashable: per-object vertex ranges) that the
  vertex stage unrolls into one MXU matmul per object, and
- per-triangle material ids resolved at shading time via bank gathers.

So "N draw calls" becomes "N static slices inside one jitted program" — the
draw loop exists at trace time only.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

from renderer_rs_tpu.resources.material import Material, MaterialBank
from renderer_rs_tpu.resources.model import Mesh, Model
from renderer_rs_tpu.resources.ubo import CameraUbo, SceneUbo
from renderer_rs_tpu.scene.light import LightBank
from renderer_rs_tpu.scene.transform import Transform


@struct.dataclass
class TextureArrays:
    """All scene textures resized to one [N,S,S,4] array per mip level, so a
    per-pixel texture id can gather without dynamic shapes. tex id -1 = none.

    atlas/atlas_offsets/atlas_sizes: the flat 2x2-window mip atlas built at
    scene build (ops/sampling.build_array_atlas) so implicit-LOD trilinear
    sampling costs TWO gathers per pixel instead of evaluating every level."""

    mips: Any  # tuple of [N,H,W,4] f32
    atlas: Any | None = None  # [R, 16] window rows
    atlas_offsets: Any | None = None  # [L] int32
    atlas_sizes: Any | None = None  # [L,2] int32
    # per-MATERIAL packed atlas: every used texture slot of a material rides
    # the same window row (ops/sampling.build_material_atlas), so a fully
    # textured fragment costs TWO gathers total instead of two per slot.
    # Indexed by texture-SET id (materials sharing the same 5-slot binding
    # share rows; mat_set maps material id -> set id); channel order =
    # 4*position within the scene's used-slot tuple (SceneLayout.texture_slots).
    mat_atlas: Any | None = None  # [R, 4*C]
    mat_offsets: Any | None = None  # [L] int32
    mat_sizes: Any | None = None  # [L,2] int32
    mat_set: Any | None = None  # [M] int32 material -> atlas set id
    # single-gather trilinear variant (ops/sampling.build_material_atlas_tri):
    # bf16 rows of [child 2x2 | parent-resample 2x2] over the PACKED
    # _SLOT_CHANNELS (13 channels fully textured) — the whole trilinear
    # footprint of every slot in ONE gather. Preferred by the shader when
    # present; mat_atlas stays as the exact f32 oracle.
    mat_atlas_tri: Any | None = None  # [R, 8*C13] bf16


@struct.dataclass
class Environment:
    """Skybox + IBL maps (wired by the full-frame config).

    The optional `irradiance_sh` / `atlas*` fields are the fast-ambient
    form built by `finalize_environment`: SH9 coefficients replace the
    per-pixel irradiance-cubemap gather, and one window atlas holds every
    prefiltered-specular level PLUS the skybox as its last segment so the
    specular lookup and the skybox sample share the same two gathers
    (covered and far-plane pixels are disjoint). The mips/LUT remain for
    the exact map-sampling path (ops/pbr.calculate_ibl)."""

    skybox_mips: Any  # CubeMap.mips tuple of [6,H,W,C]
    irradiance_mips: Any | None = None
    prefiltered_mips: Any | None = None
    brdf_lut: Any | None = None
    irradiance_sh: Any | None = None  # [9,3] SH9 coefficients
    atlas: Any | None = None  # [R,4C] window atlas (prefiltered levels + skybox)
    atlas_offsets: Any | None = None  # [L+1] int32 row offsets
    atlas_sizes: Any | None = None  # [L+1] int32 face sizes
    # [R,13C] trilinear atlas: child 2x2 + parent 3x3 per row, so the
    # specular/skybox lookup is ONE gather (ops/sampling.cube_trilinear_fetch)
    atlas_tri: Any | None = None


def finalize_environment(env: Environment) -> Environment:
    """Precompute the fast-ambient fields (SH9 irradiance + merged
    specular/skybox window atlas) on an IBL-complete Environment.

    Doing this at BUILD time keeps the per-frame jit free of the window
    packing that sample_cubemap/sample_cubemap_lod otherwise re-trace into
    every frame. No-op unless irradiance+prefiltered maps are present.
    """
    if env.irradiance_mips is None or env.prefiltered_mips is None:
        return env
    import jax

    from renderer_rs_tpu.ops.ibl import sh9_project_cubemap
    from renderer_rs_tpu.ops.sampling import (
        _cube_window_flat,
        build_cube_trilinear_atlas,
    )

    segments = list(env.prefiltered_mips) + [env.skybox_mips[0]]

    # one jitted program for the device-side finalize work (eager ops pay
    # the remote-compile hop per op on the TPU backend)
    @jax.jit
    def _fin(irr0, segs):
        return (
            sh9_project_cubemap(irr0),
            jnp.concatenate([_cube_window_flat(m) for m in segs], axis=0),
        )

    sh, atlas = _fin(env.irradiance_mips[0], tuple(segments))
    sizes, offsets, off = [], [], 0
    for m in segments:
        sizes.append(m.shape[1])
        offsets.append(off)
        off += 6 * m.shape[1] * m.shape[1]
    return env.replace(
        irradiance_sh=sh,
        atlas=atlas,
        atlas_offsets=jnp.asarray(offsets, jnp.int32),
        atlas_sizes=jnp.asarray(sizes, jnp.int32),
        atlas_tri=build_cube_trilinear_atlas(segments),
    )


@struct.dataclass
class GpuScene:
    """The dynamic pytree the jitted frame function consumes.

    ≙ the sum of all bound descriptor sets + vertex/index buffers + push
    constants of a reference frame.
    """

    # concatenated geometry (SoA, ≙ rhi::Vertex streams vertex.rs:88-170)
    positions: Any  # [V,3]
    normals: Any  # [V,3]
    uvs: Any  # [V,2]
    tangents: Any  # [V,4]
    colors: Any  # [V,3] vertex colors (TriangleVertex path)
    tris: Any  # [T,3] int32 (object-local indices already globalized)
    tri_material: Any  # [T] int32
    # per-object transforms (≙ ObjectUbo bank)
    models: Any  # [O,4,4]
    normal_mats: Any  # [O,4,4]
    # banks + UBOs
    materials: MaterialBank
    lights: LightBank
    camera: CameraUbo
    scene_ubo: SceneUbo
    # optional features (None = feature off; presence is a static property)
    textures: TextureArrays | None = None
    environment: Environment | None = None
    light_space_matrix: Any | None = None  # [4,4] sun shadow matrix
    # cascaded shadow maps (≙ CSMParams cbuffer data, shadow_csm.hlsli:31-40)
    csm_matrices: Any | None = None  # [C,4,4]
    csm_splits: Any | None = None  # [C] NDC split depths


@dataclasses.dataclass(frozen=True)
class SceneLayout:
    """Static (hashable) companion of GpuScene: jit specialization key.

    object_ranges: per-object (vertex_start, vertex_count, tri_start,
    tri_count) — the unrolled "draw list".
    """

    object_ranges: tuple[tuple[int, int, int, int], ...]
    num_vertices: int
    num_triangles: int
    has_textures: bool = False
    has_environment: bool = False
    has_shadow: bool = False
    has_csm: bool = False
    # which of the 5 texture slots (base/normal/mr/ao/emissive) any material
    # actually uses — unused slots are never traced (the static form of the
    # hasXTexture flags, model_pbr.hlsl:57-63)
    texture_slots: tuple[bool, bool, bool, bool, bool] = (False,) * 5
    # per-column constants of the packed 11-wide material bank (order of
    # renderer/passes._material_bank: base_color4, metallic, roughness, ao,
    # emissive3, normal_scale). A float means every scene material shares
    # that exact value, so the fused raster kernel skips the lane and the
    # shader rebuilds it as a broadcast scalar (~1.5 ms/lane at 1080p);
    # None = genuinely per-material, rides a kernel lane.
    material_constants: tuple = (None,) * 11

    @property
    def num_objects(self) -> int:
        return len(self.object_ranges)


class SceneBuilder:
    """Host-side scene assembly (≙ the app building its draw list)."""

    def __init__(self) -> None:
        self._meshes: list[tuple[Mesh, Transform, int]] = []
        self._materials: list[Material] = []
        self._images: list[np.ndarray] = []  # accumulated by add_model
        self._lights: LightBank | None = None
        self._camera: CameraUbo | None = None
        self._scene_ubo: SceneUbo | None = None
        self._textures: TextureArrays | None = None
        self._environment: Environment | None = None
        self._light_space_matrix = None
        self._csm_matrices = None
        self._csm_splits = None

    # --- geometry -----------------------------------------------------------
    def add_mesh(
        self,
        mesh: Mesh,
        transform: Transform | None = None,
        material: Material | int | None = None,
    ) -> "SceneBuilder":
        if isinstance(material, Material) or material is None:
            self._materials.append(material or Material())
            mat_idx = len(self._materials) - 1
        else:
            mat_idx = material
        self._meshes.append((mesh, transform or Transform(), mat_idx))
        return self

    def add_model(self, model: Model, transform: Transform | None = None) -> "SceneBuilder":
        """Add every mesh of a glTF model, keeping its material table and
        texture images (material texture indices are remapped into the
        scene-global texture array; build() assembles it unless
        set_textures was called explicitly).

        Re-adding the SAME Model object (instancing — e.g. the dancer
        repeated to a triangle budget) reuses its material/texture entries:
        only the mesh draws are appended, so N instances share one decoded
        texture set and one material table. The keying dict holds the
        model reference, so the id() stays valid for the builder's life."""
        if not hasattr(self, "_model_bases"):
            self._model_bases: dict[int, tuple] = {}
        prior = self._model_bases.get(id(model))
        if prior is not None:
            base, _model_ref = prior
            for mesh in model.meshes:
                mi = mesh.material_index
                mat_idx = base + (mi if mi is not None else 0)
                self._meshes.append((mesh, transform or Transform(), mat_idx))
            return self
        base = len(self._materials)
        base_img = len(self._images)
        self._model_bases[id(model)] = (base, model)
        mats = model.materials or [Material()]
        if model.textures:
            self._images.extend(model.textures)
            slots = (
                "base_color_texture",
                "normal_texture",
                "metallic_roughness_texture",
                "occlusion_texture",
                "emissive_texture",
            )
            mats = [
                dataclasses.replace(
                    m,
                    **{
                        s: getattr(m, s) + base_img
                        for s in slots
                        if getattr(m, s) >= 0
                    },
                )
                for m in mats
            ]
        self._materials.extend(mats)
        for mesh in model.meshes:
            mi = mesh.material_index
            mat_idx = base + (mi if mi is not None else 0)
            self._meshes.append((mesh, transform or Transform(), mat_idx))
        return self

    # --- state ----------------------------------------------------------------
    def set_lights(self, lights: LightBank) -> "SceneBuilder":
        self._lights = lights
        return self

    def set_camera(self, camera_ubo: CameraUbo) -> "SceneBuilder":
        self._camera = camera_ubo
        return self

    def set_scene_ubo(self, ubo: SceneUbo) -> "SceneBuilder":
        self._scene_ubo = ubo
        return self

    def set_textures(self, images: Sequence[np.ndarray], size: int = 256) -> "SceneBuilder":
        """Build the texture array: all images resized to size×size RGBA."""
        from renderer_rs_tpu.resources.texture import build_mip_pyramid

        arrs = []
        for img in images:
            img = np.asarray(img, np.float32)
            if img.ndim == 2:
                img = img[..., None]
            if img.shape[-1] == 3:
                img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
            elif img.shape[-1] == 1:
                img = np.concatenate([img] * 3 + [np.ones_like(img)], -1)
            if img.shape[0] != size or img.shape[1] != size:
                img = _resize_bilinear(img, size, size)
            arrs.append(img)
        stack = np.stack(arrs).astype(np.float32)  # [N,S,S,4]
        # per-level mips of the whole array — host numpy (a one-time build
        # step; eager device ops would each pay the remote-compile hop)
        mips_np = [stack]
        while mips_np[-1].shape[1] > 1:
            lvl = mips_np[-1]
            h, w = lvl.shape[1] & ~1, lvl.shape[2] & ~1
            lvl = lvl[:, :h, :w]
            mips_np.append(
                (lvl[:, 0::2, 0::2] + lvl[:, 1::2, 0::2] + lvl[:, 0::2, 1::2] + lvl[:, 1::2, 1::2])
                * 0.25
            )
        from renderer_rs_tpu.ops.sampling import build_array_atlas

        atlas, offsets, sizes = build_array_atlas(tuple(mips_np))
        mips = tuple(jnp.asarray(m) for m in mips_np)
        self._textures = TextureArrays(
            mips=mips, atlas=atlas, atlas_offsets=offsets, atlas_sizes=sizes
        )
        return self

    def set_environment(self, env: Environment, finalize: bool = True) -> "SceneBuilder":
        """Attach the skybox/IBL environment. By default IBL-complete
        environments are finalized into the fast-ambient form (SH9 +
        merged specular/skybox atlas); pass finalize=False to keep the
        exact map-sampling path (ops/pbr.calculate_ibl + skybox_pass)."""
        self._environment = finalize_environment(env) if finalize else env
        return self

    def set_shadow_matrix(self, light_space_matrix) -> "SceneBuilder":
        self._light_space_matrix = jnp.asarray(light_space_matrix, jnp.float32)
        return self

    def set_csm(self, cascade_matrices, split_depths) -> "SceneBuilder":
        """Enable cascaded shadow maps (use ops.csm.fit_cascades to build)."""
        self._csm_matrices = jnp.asarray(cascade_matrices, jnp.float32)
        self._csm_splits = jnp.asarray(split_depths, jnp.float32)
        return self

    # --- build -------------------------------------------------------------------
    def build(self) -> tuple[GpuScene, SceneLayout]:
        if not self._meshes:
            raise ValueError("scene has no meshes")
        if self._images and self._textures is None:
            # texture images accumulated by add_model -> scene texture array
            self.set_textures(self._images)
        from renderer_rs_tpu.rhi.buffer import Buffer, BufferUsage
        from renderer_rs_tpu.rhi.vertex import VertexBuffer

        pos_l, nrm_l, uv_l, tan_l, col_l, tri_l, tmat_l = [], [], [], [], [], [], []
        models, normal_mats, ranges = [], [], []
        v_off = 0
        t_off = 0
        for mesh, transform, mat_idx in self._meshes:
            n = mesh.vertex_count
            t = mesh.triangle_count
            # per-mesh SoA stream validation/normalization (≙ rhi::Vertex,
            # vertex.rs:88-170): shape-checks the attributes and applies the
            # loader defaulting rules for absent streams
            vb = VertexBuffer.create(
                mesh.positions, mesh.normals, mesh.tex_coords, mesh.tangents
            )
            pos_l.append(np.asarray(vb.position))
            nrm_l.append(np.asarray(vb.normal))
            uv_l.append(np.asarray(vb.tex_coord))
            tan_l.append(np.asarray(vb.tangent))
            col = getattr(mesh, "colors", None)
            col_l.append(
                col if col is not None else np.ones((n, 3), np.float32)
            )
            tri_l.append(mesh.indices.reshape(-1, 3).astype(np.int32) + v_off)
            tmat_l.append(np.full(t, mat_idx, np.int32))
            models.append(np.asarray(transform.world_matrix()))
            normal_mats.append(np.asarray(transform.normal_matrix()))
            ranges.append((v_off, n, t_off, t))
            v_off += n
            t_off += t

        # usage-tagged uploads (≙ Buffer::new_with_data, buffer.rs:227-257):
        # geometry streams are VERTEX/INDEX buffers; placement policy follows
        # the reference's memory-location table (rhi/buffer.py)
        def vbuf(arrs):
            return Buffer.new_with_data(BufferUsage.VERTEX, np.concatenate(arrs)).data

        scene = GpuScene(
            positions=vbuf(pos_l),
            normals=vbuf(nrm_l),
            uvs=vbuf(uv_l),
            tangents=vbuf(tan_l),
            colors=vbuf(col_l),
            tris=Buffer.new_with_data(
                BufferUsage.INDEX, np.concatenate(tri_l)
            ).data,
            tri_material=jnp.asarray(np.concatenate(tmat_l)),
            models=jnp.asarray(np.stack(models)),
            normal_mats=jnp.asarray(np.stack(normal_mats)),
            materials=MaterialBank.create(self._materials),
            lights=self._lights or LightBank.create(),
            camera=self._camera
            or CameraUbo.create(jnp.eye(4), jnp.eye(4), jnp.zeros(3)),
            scene_ubo=self._scene_ubo or SceneUbo.create(),
            textures=self._textures,
            environment=self._environment,
            light_space_matrix=self._light_space_matrix,
            csm_matrices=self._csm_matrices,
            csm_splits=self._csm_splits,
        )
        slot_used = tuple(
            any(
                getattr(m, attr) >= 0
                for m in self._materials
            )
            for attr in (
                "base_color_texture",
                "normal_texture",
                "metallic_roughness_texture",
                "occlusion_texture",
                "emissive_texture",
            )
        )
        # static per-column constants of the material bank (host-side, exact
        # float compare; mirrors renderer/passes._material_bank order)
        bank_rows = np.asarray(
            [
                list(np.asarray(m.base_color, np.float32))
                + [
                    np.float32(m.metallic),
                    np.float32(m.roughness),
                    np.float32(m.ao),
                ]
                + list(np.asarray(m.emissive, np.float32)[:3])
                + [np.float32(m.normal_scale)]
                for m in self._materials
            ],
            np.float32,
        )
        mat_consts = tuple(
            float(col[0]) if np.all(col == col[0]) else None for col in bank_rows.T
        )
        if scene.textures is not None and any(slot_used):
            # budget guard: L0 rows = M * S^2; skip the packed build for
            # pathological material counts (falls back to per-slot atlas)
            from renderer_rs_tpu.ops.sampling import build_material_atlas
            from renderer_rs_tpu.resources.texture import Sampler

            s0 = int(np.asarray(scene.textures.mips[0]).shape[1])
            used = tuple(i for i, u in enumerate(slot_used) if u)
            bank = MaterialBank.create(self._materials)
            # dedupe: materials sharing the same 5-slot binding share rows
            id_rows = np.asarray(bank.tex_ids)
            uniq, mat_set = np.unique(id_rows, axis=0, return_inverse=True)
            if uniq.shape[0] * s0 * s0 <= 16_000_000:
                mat_atlas, mat_off, mat_sz = build_material_atlas(
                    tuple(np.asarray(m) for m in scene.textures.mips),
                    uniq,
                    used,
                    Sampler(),
                )
                from renderer_rs_tpu.ops.sampling import (
                    build_material_atlas_tri,
                )

                tri_atlas, _, _ = build_material_atlas_tri(
                    tuple(np.asarray(m) for m in scene.textures.mips),
                    uniq,
                    used,
                    Sampler(),
                )
                scene = scene.replace(
                    textures=scene.textures.replace(
                        mat_atlas=mat_atlas,
                        mat_offsets=mat_off,
                        mat_sizes=mat_sz,
                        mat_set=jnp.asarray(mat_set.reshape(-1), jnp.int32),
                        mat_atlas_tri=tri_atlas,
                    )
                )
        layout = SceneLayout(
            object_ranges=tuple(ranges),
            num_vertices=v_off,
            num_triangles=t_off,
            material_constants=mat_consts,
            has_textures=self._textures is not None,
            has_environment=self._environment is not None,
            has_shadow=self._light_space_matrix is not None,
            has_csm=self._csm_matrices is not None,
            texture_slots=slot_used if self._textures is not None else (False,) * 5,
        )
        return scene, layout


def _resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Host-side bilinear resize (texture array normalization)."""
    import jax

    return np.asarray(
        jax.image.resize(jnp.asarray(img), (h, w, img.shape[-1]), "bilinear")
    )
