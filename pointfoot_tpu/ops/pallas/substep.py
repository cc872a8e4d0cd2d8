"""Physics substep as ONE lane-batched Pallas TPU kernel.

docs/PROFILE_SUBSTEP.md: the XLA substep compiles to 81 fusions + 37
custom-calls and is kernel-launch bound (wall-time flat in batch size up to
4096 envs).  This kernel runs the ENTIRE substep — FK, CRBA, RNEA, contact,
implicit Cholesky velocity solve, integration (physics/rowdyn.py) — as one
straight-line program where every per-env scalar is an (8, 128) lane tile
covering 1024 envs: every arithmetic op is a full-vreg VPU op and the only
HBM traffic is state/params in, state out.

Layout: all rows packed into one (R, 8, B/8) array (env e lives at sublane
s = e // (B/8), lane l = e % (B/8); blocks take 128 lanes at a time, so one
grid step processes 8x128 = 1024 envs).  Terrain enters as per-contact
surface rows (height + normal, gathered OUTSIDE by the caller at foot
positions computed from the same pre-step state); flat ground folds the
surface to constants at trace time, which prunes most of the contact math.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointfoot_tpu.physics import rowdyn
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState

import os

_SUB = 8
# lanes per row op: one (8, LANE) row = LANE/128 vregs; wider rows issue
# multiple vregs back-to-back per op, hiding VPU latency on the long
# dependency chains (Cholesky, RNEA accumulation) that dominate this
# straight-line kernel.  Tunable for A/B: PALLAS_SUBSTEP_LANE.
_LANE = int(os.environ.get("PALLAS_SUBSTEP_LANE", "512"))
_BLOCK = _SUB * _LANE  # envs per grid step


def _in_layout(nj: int, nc: int, has_surface: bool):
    rows = [
        ("base_pos", 3), ("base_quat", 4), ("base_lin_vel", 3),
        ("base_ang_vel", 3), ("qpos", nj), ("qvel", nj), ("tau", nj),
        ("ext_force", 3), ("friction", nc), ("joint_friction", nj),
        ("added_mass", 1), ("com_offset", 3), ("k_contact", 1),
        ("d_contact", 1),
    ]
    if has_surface:
        rows += [("surf_h", nc), ("surf_n", 3 * nc)]
    return rows


def _out_layout(nj: int, nc: int):
    return [
        ("base_pos", 3), ("base_quat", 4), ("base_lin_vel", 3),
        ("base_ang_vel", 3), ("qpos", nj), ("qvel", nj),
        ("contact_force", 3 * nc),
    ]


def _kernel(mc: rowdyn.ModelConsts, dt: float, gravity: float,
            has_surface: bool, in_ref, out_ref):
    nj, nc = mc.nj, mc.nc
    idx = {}
    off = 0
    for name, cnt in _in_layout(nj, nc, has_surface):
        idx[name] = off
        off += cnt

    def row(name, i=0):
        return in_ref[idx[name] + i]

    st = {
        "base_pos": [row("base_pos", i) for i in range(3)],
        "base_quat": [row("base_quat", i) for i in range(4)],
        "base_lin_vel": [row("base_lin_vel", i) for i in range(3)],
        "base_ang_vel": [row("base_ang_vel", i) for i in range(3)],
        "qpos": [row("qpos", j) for j in range(nj)],
        "qvel": [row("qvel", j) for j in range(nj)],
        "tau": [row("tau", j) for j in range(nj)],
        "ext_force": [row("ext_force", i) for i in range(3)],
        "friction": [row("friction", c) for c in range(nc)],
        "joint_friction": [row("joint_friction", j) for j in range(nj)],
        "added_mass": row("added_mass"),
        "com_offset": [row("com_offset", i) for i in range(3)],
        "k_contact": row("k_contact"),
        "d_contact": row("d_contact"),
    }
    surface = None
    if has_surface:
        surface = [(row("surf_h", c),
                    [row("surf_n", 3 * c + i) for i in range(3)])
                   for c in range(nc)]

    out = rowdyn.substep_rows(mc, st, dt, gravity, surface=surface)

    o = 0
    flat_out = (out["base_pos"] + out["base_quat"] + out["base_lin_vel"]
                + out["base_ang_vel"] + out["qpos"] + out["qvel"]
                + [f for fc in out["contact_force"] for f in fc])
    ones = jnp.ones((_SUB, _LANE), jnp.float32)
    for val in flat_out:
        # constants (e.g. folded-away components) broadcast to the tile
        out_ref[o] = val * ones if isinstance(val, (int, float)) else val
        o += 1


def substep_pallas(model, params: PhysicsParams, state: PhysicsState,
                   joint_torque: jax.Array, dt: float,
                   gravity: float = 9.81,
                   external_force: Optional[jax.Array] = None,
                   surface: Optional[Tuple[jax.Array, jax.Array]] = None,
                   interpret: bool = False) -> PhysicsState:
    """One batched substep via the mega-kernel.

    `params` leaves are batched (B, ...) as in `dynamics.step_batched`;
    `surface` is None (flat ground, z=0) or (heights (B, nc),
    normals (B, nc, 3)) in world coordinates under each collision sphere.
    """
    mc = _model_consts(model)
    nj, nc = mc.nj, mc.nc
    B = state.base_pos.shape[0]
    has_surface = surface is not None

    cols = [
        state.base_pos, state.base_quat, state.base_lin_vel,
        state.base_ang_vel, state.qpos, state.qvel, joint_torque,
        (external_force if external_force is not None
         else jnp.zeros((B, 3), jnp.float32)),
        params.friction, params.joint_friction,
        params.added_mass[..., None], params.com_offset,
        params.contact_stiffness[..., None], params.contact_damping[..., None],
    ]
    if has_surface:
        h, n = surface
        cols += [h, n.reshape(B, 3 * nc)]
    x = jnp.concatenate([jnp.asarray(c, jnp.float32) for c in cols],
                        axis=-1)  # (B, R_in)
    R_in = x.shape[-1]
    R_out = sum(cnt for _, cnt in _out_layout(nj, nc))

    Bp = ((B + _BLOCK - 1) // _BLOCK) * _BLOCK
    if Bp != B:
        # pad with copies of env 0 (a valid state: no NaNs in the solve)
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (Bp - B, R_in))], axis=0)
    rows_in = x.T.reshape(R_in, _SUB, Bp // _SUB)

    kernel = functools.partial(_kernel, mc, float(dt), float(gravity),
                               has_surface)
    lanes = Bp // _SUB
    out_rows = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_out, _SUB, lanes), jnp.float32),
        grid=(Bp // _BLOCK,),
        in_specs=[pl.BlockSpec((R_in, _SUB, _LANE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R_out, _SUB, _LANE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows_in)

    y = out_rows.reshape(R_out, Bp).T[:B]  # (B, R_out)
    off = {}
    o = 0
    for name, cnt in _out_layout(nj, nc):
        off[name] = (o, o + cnt)
        o += cnt

    def take(name):
        a, b = off[name]
        return y[:, a:b]

    return PhysicsState(
        base_pos=take("base_pos"),
        base_quat=take("base_quat"),
        base_lin_vel=take("base_lin_vel"),
        base_ang_vel=take("base_ang_vel"),
        qpos=take("qpos"),
        qvel=take("qvel"),
        contact_force=take("contact_force").reshape(B, nc, 3),
    )


_MC_CACHE = {}


def _model_consts(model) -> rowdyn.ModelConsts:
    key = id(model)
    mc = _MC_CACHE.get(key)
    if mc is None:
        mc = rowdyn.ModelConsts(model)
        _MC_CACHE[key] = mc
    return mc


def _fk_kernel(mc: rowdyn.ModelConsts, in_ref, out_ref):
    nj = mc.nj
    st = {
        "base_pos": [in_ref[i] for i in range(3)],
        "base_quat": [in_ref[3 + i] for i in range(4)],
        "qpos": [in_ref[7 + j] for j in range(nj)],
    }
    xy = rowdyn.fk_contact_xy(mc, st)
    ones = jnp.ones((_SUB, _LANE), jnp.float32)
    o = 0
    for c in range(mc.nc):
        for v in xy[c]:
            out_ref[o] = v * ones if isinstance(v, (int, float)) else v
            o += 1


def fk_contact_xy_pallas(model, state: PhysicsState,
                         interpret: bool = False) -> jax.Array:
    """(B, nc, 2) world xy of every collision sphere — the terrain-query
    positions, as a single tiny Pallas kernel (replaces the launch-bound
    XLA mini-FK; see docs/PROFILE_SUBSTEP.md)."""
    mc = _model_consts(model)
    B = state.base_pos.shape[0]
    x = jnp.concatenate([state.base_pos, state.base_quat, state.qpos],
                        axis=-1).astype(jnp.float32)  # (B, 7+nj)
    R_in = x.shape[-1]
    R_out = 2 * mc.nc
    Bp = ((B + _BLOCK - 1) // _BLOCK) * _BLOCK
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (Bp - B, R_in))], axis=0)
    rows_in = x.T.reshape(R_in, _SUB, Bp // _SUB)
    out_rows = pl.pallas_call(
        functools.partial(_fk_kernel, mc),
        out_shape=jax.ShapeDtypeStruct((R_out, _SUB, Bp // _SUB),
                                       jnp.float32),
        grid=(Bp // _BLOCK,),
        in_specs=[pl.BlockSpec((R_in, _SUB, _LANE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R_out, _SUB, _LANE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows_in)
    y = out_rows.reshape(R_out, Bp).T[:B]
    return y.reshape(B, mc.nc, 2)


# --------------------------- fused decimation rollout (one kernel/substep,
# state stays in row layout across the loop; PD torque + FK-of-output live
# inside the kernel, so the only XLA work between substeps is the terrain
# surface gather)

def _state_layout(nj: int):
    return [("base_pos", 3), ("base_quat", 4), ("base_lin_vel", 3),
            ("base_ang_vel", 3), ("qpos", nj), ("qvel", nj),
            ("last_qvel", nj)]


def _ctrl_layout(nj: int, nc: int):
    return [("actions", nj), ("kp", nj), ("kd", nj), ("friction", nc),
            ("joint_friction", nj), ("added_mass", 1), ("com_offset", 3),
            ("k_contact", 1), ("d_contact", 1), ("push", 3)]


def _read(ref, layout):
    idx, out = 0, {}
    for name, cnt in layout:
        out[name] = [ref[idx + i] for i in range(cnt)]
        idx += cnt
    return out


def _rollout_kernel(mc, dt, gravity, has_surface, with_push, default_qpos,
                    action_scale, control_type, sim_dt, *refs):
    if has_surface:
        state_ref, ctrl_ref, surf_ref, out_state_ref, out_extra_ref = refs
    else:
        state_ref, ctrl_ref, out_state_ref, out_extra_ref = refs
    nj, nc = mc.nj, mc.nc
    sv = _read(state_ref, _state_layout(nj))
    cv = _read(ctrl_ref, _ctrl_layout(nj, nc))

    st = {
        "base_pos": sv["base_pos"], "base_quat": sv["base_quat"],
        "base_lin_vel": sv["base_lin_vel"],
        "base_ang_vel": sv["base_ang_vel"],
        "qpos": sv["qpos"], "qvel": sv["qvel"],
        "last_qvel": sv["last_qvel"],
        "actions": cv["actions"], "kp": cv["kp"], "kd": cv["kd"],
        "friction": cv["friction"], "joint_friction": cv["joint_friction"],
        "added_mass": cv["added_mass"][0], "com_offset": cv["com_offset"],
        "k_contact": cv["k_contact"][0], "d_contact": cv["d_contact"][0],
        "ext_force": (cv["push"] if with_push else [0.0, 0.0, 0.0]),
    }
    st["tau"] = rowdyn.pd_torque_rows(mc, st, default_qpos, action_scale,
                                      control_type, sim_dt)
    surface = None
    if has_surface:
        surface = [(surf_ref[c], [surf_ref[nc + 3 * c + i]
                                  for i in range(3)]) for c in range(nc)]
    out = rowdyn.substep_rows(mc, st, dt, gravity, surface=surface)
    xyz = rowdyn.fk_contact_pos(mc, {
        "base_pos": out["base_pos"], "base_quat": out["base_quat"],
        "qpos": out["qpos"]})

    ones = jnp.ones((_SUB, _LANE), jnp.float32)

    def w(ref, o, vals):
        for v in vals:
            ref[o] = v * ones if isinstance(v, (int, float)) else v
            o += 1
        return o

    o = 0
    o = w(out_state_ref, o, out["base_pos"])
    o = w(out_state_ref, o, out["base_quat"])
    o = w(out_state_ref, o, out["base_lin_vel"])
    o = w(out_state_ref, o, out["base_ang_vel"])
    o = w(out_state_ref, o, out["qpos"])
    o = w(out_state_ref, o, out["qvel"])
    o = w(out_state_ref, o, sv["qvel"])  # next substep's last_qvel
    e = 0
    e = w(out_extra_ref, e, st["tau"])
    e = w(out_extra_ref, e, [f for fc in out["contact_force"] for f in fc])
    e = w(out_extra_ref, e, [v for p in xyz for v in p])


def _fk_from_state_kernel(mc, state_ref, out_ref):
    nj = mc.nj
    sv = _read(state_ref, _state_layout(nj))
    xyz = rowdyn.fk_contact_pos(mc, {
        "base_pos": sv["base_pos"], "base_quat": sv["base_quat"],
        "qpos": sv["qpos"]})
    ones = jnp.ones((_SUB, _LANE), jnp.float32)
    o = 0
    for p in xyz:
        for v in p:
            out_ref[o] = v * ones if isinstance(v, (int, float)) else v
            o += 1


def rollout_substeps(model, params: PhysicsParams, phys: PhysicsState,
                     actions: jax.Array, last_qvel: jax.Array,
                     push: jax.Array, height_fn, sim_dt: float, n_sub: int,
                     default_qpos, action_scale: float, control_type: str,
                     gravity: float = 9.81, interpret: bool = False):
    """Full decimation loop (reference point_foot.py:180-185) fused:
    one mega-kernel per substep, row layout threaded across the loop.

    Returns (PhysicsState, last_tau (B, nj), sphere_pos (B, nc, 3)) —
    sphere_pos is the FK of the FINAL state (what the env's
    `_foot_positions` would recompute).
    """
    mc = _model_consts(model)
    nj, nc = mc.nj, mc.nc
    B = phys.base_pos.shape[0]
    flat = getattr(height_fn, "is_flat", False)
    dq = tuple(float(v) for v in np.asarray(default_qpos))

    def pack(cols):
        x = jnp.concatenate([jnp.asarray(c, jnp.float32) for c in cols],
                            axis=-1)
        R = x.shape[-1]
        Bp = ((B + _BLOCK - 1) // _BLOCK) * _BLOCK
        if Bp != B:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (Bp - B, R))], axis=0)
        return x.T.reshape(R, _SUB, Bp // _SUB), Bp

    state_rows, Bp = pack([phys.base_pos, phys.base_quat, phys.base_lin_vel,
                           phys.base_ang_vel, phys.qpos, phys.qvel,
                           last_qvel])
    ctrl_rows, _ = pack([actions, params.kp, params.kd, params.friction,
                         params.joint_friction, params.added_mass[..., None],
                         params.com_offset,
                         params.contact_stiffness[..., None],
                         params.contact_damping[..., None], push])
    lanes = Bp // _SUB
    R_state = sum(c for _, c in _state_layout(nj))
    R_extra = nj + 6 * nc
    spec = lambda R: pl.BlockSpec((R, _SUB, _LANE), lambda i: (0, 0, i),
                                  memory_space=pltpu.VMEM)

    if not flat:
        xyz_rows = pl.pallas_call(
            functools.partial(_fk_from_state_kernel, mc),
            out_shape=jax.ShapeDtypeStruct((3 * nc, _SUB, lanes),
                                           jnp.float32),
            grid=(Bp // _BLOCK,),
            in_specs=[spec(R_state)], out_specs=spec(3 * nc),
            interpret=interpret,
        )(state_rows)

    extra_rows = None
    for i in range(n_sub):
        ins = [state_rows, ctrl_rows]
        in_specs = [spec(R_state), spec(ctrl_rows.shape[0])]
        if not flat:
            from pointfoot_tpu.physics import contact as contact_mod

            x = xyz_rows.reshape(nc, 3, _SUB, lanes)
            h, n = contact_mod.query_surface(height_fn, x[:, 0], x[:, 1])
            surf_rows = jnp.concatenate(
                [h, jnp.moveaxis(n, -1, 1).reshape(3 * nc, _SUB, lanes)],
                axis=0)
            ins.append(surf_rows)
            in_specs.append(spec(surf_rows.shape[0]))
        kernel = functools.partial(
            _rollout_kernel, mc, float(sim_dt), float(gravity), not flat,
            i == 0, dq, float(action_scale), control_type, float(sim_dt))
        state_rows, extra_rows = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((R_state, _SUB, lanes),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((R_extra, _SUB, lanes),
                                            jnp.float32)),
            grid=(Bp // _BLOCK,),
            in_specs=in_specs,
            out_specs=(spec(R_state), spec(R_extra)),
            interpret=interpret,
        )(*ins)
        if not flat:
            xyz_rows = extra_rows[nj + 3 * nc:]

    def unpack(rows, R):
        return rows.reshape(R, Bp).T[:B]

    s = unpack(state_rows, R_state)
    e = unpack(extra_rows, R_extra)
    off = {}
    o = 0
    for name, cnt in _state_layout(nj):
        off[name] = (o, o + cnt)
        o += cnt
    new_phys = PhysicsState(
        base_pos=s[:, off["base_pos"][0]:off["base_pos"][1]],
        base_quat=s[:, off["base_quat"][0]:off["base_quat"][1]],
        base_lin_vel=s[:, off["base_lin_vel"][0]:off["base_lin_vel"][1]],
        base_ang_vel=s[:, off["base_ang_vel"][0]:off["base_ang_vel"][1]],
        qpos=s[:, off["qpos"][0]:off["qpos"][1]],
        qvel=s[:, off["qvel"][0]:off["qvel"][1]],
        contact_force=e[:, nj:nj + 3 * nc].reshape(B, nc, 3),
    )
    tau_last = e[:, :nj]
    sphere_pos = e[:, nj + 3 * nc:].reshape(B, nc, 3)
    return new_phys, tau_last, sphere_pos


def rollout_substeps_sharded(mesh, axis: str, model, params: PhysicsParams,
                             phys: PhysicsState, actions: jax.Array,
                             last_qvel: jax.Array, push: jax.Array,
                             height_fn, sim_dt: float, n_sub: int,
                             default_qpos, action_scale: float,
                             control_type: str, gravity: float = 9.81,
                             interpret: bool = False):
    """Multi-device fused rollout: `rollout_substeps` under `jax.shard_map`.

    A `pallas_call` is not auto-partitioned by pjit, so the single-device
    mega-kernel path was gated off under multi-chip meshes (the XLA substep
    ran instead).  The TPU recipe is to shard_map the kernel over the DP
    axis: each device runs the identical fused rollout on its local batch
    shard, no collectives inside (physics is embarrassingly env-parallel;
    the terrain arrays close over as replicated constants).  Per-device
    batch should clear `_BLOCK` or the kernel pads with copies of env 0 —
    the dispatch in `legged_env._physics_rollout` enforces that.
    """
    batch = jax.sharding.PartitionSpec(axis)

    def body(params_, phys_, actions_, last_qvel_, push_):
        return rollout_substeps(
            model, params_, phys_, actions_, last_qvel_, push_, height_fn,
            sim_dt, n_sub, default_qpos, action_scale, control_type,
            gravity=gravity, interpret=interpret)

    # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry no
    # varying-mesh-axes annotation, and there are no collectives to check —
    # every output is per-shard batch data
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(batch, batch, batch, batch, batch),
        out_specs=(batch, batch, batch),
        check_vma=False,
    )(params, phys, actions, last_qvel, push)
