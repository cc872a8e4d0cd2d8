"""Per-env physics substep in scalar-row form (the Pallas mega-kernel body).

The profile in docs/PROFILE_SUBSTEP.md showed the XLA substep is
kernel-launch bound: 81 fusions + 37 custom-calls whose wall-time is flat
in batch size up to 4096 envs.  The fix is ONE kernel whose per-env
computation is fully unrolled straight-line code over "rows" — each
per-env scalar held as a (8, 128) lane tile covering 1024 envs, so every
arithmetic op below is a full-vreg VPU op (ops/pallas/substep.py stages
the layout and runs this module inside `pl.pallas_call`).

This module is LAYOUT-AGNOSTIC: a "row" is anything jnp-broadcastable.
Running it with shape-() rows reproduces `dynamics.step` for one env
(pinned by tests/test_rowdyn.py against the reference implementation),
which is what makes the kernel testable without TPU hardware.

Static model data (tree, inertials, axes, limits) enters as python floats
and is folded at trace time: `fmul`/`fadd` elide multiplications by 0/±1,
which prunes roughly half the generated ops (joint axes are canonical unit
vectors, joint frames are mostly identity).

Semantics are EXACTLY physics/dynamics.py (same citations apply):
implicit-damping velocity solve
    (M + dt·JᵀDJ + dt·diag(b_joint) + 1e-6 I) u⁺ = M u + dt·(τ + Jᵀf₀ − C)
then finish_step integration including the spatial→material transport
term.  Any behavioral change must land in BOTH modules; the parity test
fails otherwise.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.physics.contact import MAX_DEPENETRATION_VEL, PEN_REST

# --------------------------------------------------------------- row algebra

def _isconst(a) -> bool:
    return isinstance(a, (int, float))


def is0(a) -> bool:
    return _isconst(a) and a == 0.0


def fmul(a, b):
    if is0(a) or is0(b):
        return 0.0
    if _isconst(a) and a == 1.0:
        return b
    if _isconst(b) and b == 1.0:
        return a
    if _isconst(a) and _isconst(b):
        return a * b
    return a * b


def fadd(*xs):
    out = None
    const = 0.0
    for x in xs:
        if is0(x):
            continue
        if _isconst(x):
            const += x
            continue
        out = x if out is None else out + x
    if out is None:
        return const
    return out if const == 0.0 else out + const


def fsub(a, b):
    return fadd(a, fneg(b))


def fneg(a):
    if is0(a):
        return 0.0
    return -a


def dot3(u, v):
    return fadd(fmul(u[0], v[0]), fmul(u[1], v[1]), fmul(u[2], v[2]))


def cross3(u, v):
    return [
        fsub(fmul(u[1], v[2]), fmul(u[2], v[1])),
        fsub(fmul(u[2], v[0]), fmul(u[0], v[2])),
        fsub(fmul(u[0], v[1]), fmul(u[1], v[0])),
    ]


def v_add(u, v):
    return [fadd(a, b) for a, b in zip(u, v)]


def v_sub(u, v):
    return [fsub(a, b) for a, b in zip(u, v)]


def v_scale(s, u):
    return [fmul(s, a) for a in u]


def m_vec(M, v):
    return [fadd(*[fmul(M[i][j], v[j]) for j in range(len(v))])
            for i in range(len(M))]


def m_mul(A, B):
    n, k, m = len(A), len(B), len(B[0])
    return [[fadd(*[fmul(A[i][p], B[p][j]) for p in range(k)])
             for j in range(m)] for i in range(n)]


def m_add(A, B):
    return [[fadd(a, b) for a, b in zip(ra, rb)] for ra, rb in zip(A, B)]


def m_T(A):
    return [list(r) for r in zip(*A)]


def skew3(v):
    return [[0.0, fneg(v[2]), v[1]],
            [v[2], 0.0, fneg(v[0])],
            [fneg(v[1]), v[0], 0.0]]


# 6-vectors are [angular(3); linear(3)] — Featherstone stacking (ops/spatial.py)

def motion_cross6(v, m):
    w, vl = v[:3], v[3:]
    w2, v2 = m[:3], m[3:]
    return cross3(w, w2) + v_add(cross3(w, v2), cross3(vl, w2))


def force_cross6(v, f):
    w, vl = v[:3], v[3:]
    n, fl = f[:3], f[3:]
    return v_add(cross3(w, n), cross3(vl, fl)) + cross3(w, fl)


def spatial_inertia6(mass, com, inertia_w):
    """[[I + m c̃ c̃ᵀ, m c̃], [m c̃ᵀ, m E]] (ops/spatial.py spatial_inertia)."""
    cx = skew3(com)
    cxT = m_T(cx)
    tl = m_add(inertia_w, [[fmul(mass, e) for e in row]
                           for row in m_mul(cx, cxT)])
    tr = [[fmul(mass, e) for e in row] for row in cx]
    bl = m_T(tr)
    I6 = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            I6[i][j] = tl[i][j]
            I6[i][3 + j] = tr[i][j]
            I6[3 + i][j] = bl[i][j]
        I6[3 + i][3 + i] = mass
    return I6


def quat_to_mat(q):
    """xyzw quaternion -> 3x3 (ops/quat.to_matrix)."""
    x, y, z, w = q
    xx, yy, zz = fmul(x, x), fmul(y, y), fmul(z, z)
    xy, xz, yz = fmul(x, y), fmul(x, z), fmul(y, z)
    wx, wy, wz = fmul(w, x), fmul(w, y), fmul(w, z)
    return [
        [fadd(1.0, fmul(-2.0, fadd(yy, zz))), fmul(2.0, fsub(xy, wz)),
         fmul(2.0, fadd(xz, wy))],
        [fmul(2.0, fadd(xy, wz)), fadd(1.0, fmul(-2.0, fadd(xx, zz))),
         fmul(2.0, fsub(yz, wx))],
        [fmul(2.0, fsub(xz, wy)), fmul(2.0, fadd(yz, wx)),
         fadd(1.0, fmul(-2.0, fadd(xx, yy)))],
    ]


def quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return [
        fadd(fmul(aw, bx), fmul(ax, bw), fmul(ay, bz), fneg(fmul(az, by))),
        fadd(fmul(aw, by), fneg(fmul(ax, bz)), fmul(ay, bw), fmul(az, bx)),
        fadd(fmul(aw, bz), fmul(ax, by), fneg(fmul(ay, bx)), fmul(az, bw)),
        fadd(fmul(aw, bw), fneg(fmul(ax, bx)), fneg(fmul(ay, by)),
             fneg(fmul(az, bz))),
    ]


def rodrigues_const_axis(axis: Sequence[float], q):
    """R = I + sin(q) K + (1-cos(q)) K² for a CONSTANT unit axis.

    K, K² are static floats — the result has at most 9 live rows.
    """
    K = [[0.0, -axis[2], axis[1]],
         [axis[2], 0.0, -axis[0]],
         [-axis[1], axis[0], 0.0]]
    KK = [[sum(K[i][p] * K[p][j] for p in range(3)) for j in range(3)]
          for i in range(3)]
    s, c = jnp.sin(q), jnp.cos(q)
    one_c = 1.0 - c
    R = [[0.0] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            R[i][j] = fadd(1.0 if i == j else 0.0,
                           fmul(s, K[i][j]), fmul(one_c, KK[i][j]))
    return R


def chol_solve_rows(A: List[List], b: List) -> List:
    """Unrolled Cholesky factor+solve (ops/pallas/cholesky.py kernel form)."""
    n = len(b)
    L: Dict[Tuple[int, int], object] = {}
    for j in range(n):
        s = A[j][j]
        for k in range(j):
            s = fsub(s, fmul(L[(j, k)], L[(j, k)]))
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[(j, j)] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[i][j]
            for k in range(j):
                s = fsub(s, fmul(L[(i, k)], L[(j, k)]))
            L[(i, j)] = fmul(s, inv_d)
    y = {}
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = fsub(s, fmul(L[(i, k)], y[k]))
        y[i] = s / L[(i, i)]
    x = {}
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = fsub(s, fmul(L[(k, i)], x[k]))
        x[i] = s / L[(i, i)]
    return [x[i] for i in range(n)]


# ------------------------------------------------------------ model snapshot

class ModelConsts:
    """Plain-python snapshot of RobotModel (trace-time constants)."""

    def __init__(self, model):
        self.nb = int(model.nb)
        self.nj = int(model.nj)
        self.nv = int(model.nv)
        self.parent = tuple(int(p) for p in model.parent)
        self.joint_pos = np.asarray(model.joint_pos, np.float64).tolist()
        jr = np.asarray(model.joint_rot, np.float64)
        self.joint_rot_mat = []
        for j in range(self.nj):
            x, y, z, w = jr[j]
            self.joint_rot_mat.append([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)],
            ])
        self.joint_axis = np.asarray(model.joint_axis, np.float64).tolist()
        self.q_lower = np.asarray(model.q_lower, np.float64).tolist()
        self.q_upper = np.asarray(model.q_upper, np.float64).tolist()
        self.velocity_limit = np.asarray(
            model.velocity_limit, np.float64).tolist()
        self.effort_limit = np.asarray(
            model.effort_limit, np.float64).tolist()
        self.joint_damping = np.asarray(
            model.joint_damping, np.float64).tolist()
        self.mass = np.asarray(model.mass, np.float64).tolist()
        self.com = np.asarray(model.com, np.float64).tolist()
        self.inertia = np.asarray(model.inertia, np.float64).tolist()
        self.collision_body = tuple(int(b) for b in model.collision_body)
        self.collision_offset = np.asarray(
            model.collision_offset, np.float64).tolist()
        self.collision_radius = np.asarray(
            model.collision_radius, np.float64).tolist()
        self.nc = len(self.collision_body)
        # static ancestor-joint chains (contact.py _ancestor_joints)
        self.ancestors = []
        for b in self.collision_body:
            chain = []
            bb = b
            while bb > 0:
                chain.append(bb - 1)
                bb = self.parent[bb]
            self.ancestors.append(tuple(reversed(chain)))


# ----------------------------------------------------------------- substep

def substep_rows(mc: ModelConsts, st: Dict, dt: float, gravity: float,
                 surface=None) -> Dict:
    """One physics substep on rows.  `st` keys (all rows / row-lists):

    base_pos[3], base_quat[4], base_lin_vel[3], base_ang_vel[3],
    qpos[nj], qvel[nj], tau[nj], ext_force[3],
    friction[nc], joint_friction[nj], added_mass, com_offset[3],
    k_contact, d_contact.

    `surface`: per-contact (height_row, normal_row3) in WORLD coordinates,
    or None for flat ground at z=0.  Returns the same state keys plus
    contact_force[nc][3].

    Everything is computed relative to the base origin (dynamics.py uses
    origin = state.base_pos), so base_pos enters only the contact heights
    and the final position integration.
    """
    nb, nj, nv, nc = mc.nb, mc.nj, mc.nv, mc.nc
    w0 = st["base_ang_vel"]
    v0 = st["base_lin_vel"]
    qvel = st["qvel"]

    # ---- forward kinematics (dynamics.forward_kinematics), origin-relative
    R = [quat_to_mat(st["base_quat"])]
    pos = [[0.0, 0.0, 0.0]]
    axis_w: List = []
    anchor: List = []
    for b in range(1, nb):
        j = b - 1
        p = mc.parent[b]
        anch = v_add(pos[p], m_vec(R[p], mc.joint_pos[j]))
        frame0 = m_mul(R[p], mc.joint_rot_mat[j])
        axis_w.append(m_vec(frame0, mc.joint_axis[j]))
        R.append(m_mul(frame0, rodrigues_const_axis(mc.joint_axis[j],
                                                    st["qpos"][j])))
        pos.append(anch)
        anchor.append(anch)
    com_w = []
    inertia_w = []
    for b in range(nb):
        cb = list(mc.com[b])
        if b == 0:
            cb = v_add(cb, st["com_offset"])
        com_w.append(v_add(pos[b], m_vec(R[b], cb)))
        inertia_w.append(m_mul(m_mul(R[b], mc.inertia[b]), m_T(R[b])))

    # ---- motion subspaces S (identity base rows are implicit)
    S = []  # per joint: 6-list
    for j in range(nj):
        S.append(axis_w[j] + cross3(anchor[j], axis_w[j]))

    # ---- body spatial velocities
    V = [list(w0) + list(v0)]
    for b in range(1, nb):
        j = b - 1
        V.append(v_add(V[mc.parent[b]], v_scale(qvel[j], S[j])))

    # ---- spatial inertias (effective base mass includes added_mass)
    Isp = []
    for b in range(nb):
        mass_b = (fadd(mc.mass[0], st["added_mass"]) if b == 0
                  else mc.mass[b])
        Isp.append(spatial_inertia6(mass_b, com_w[b], inertia_w[b]))

    # ---- CRBA mass matrix
    Ic = [ [row[:] for row in Isp[b]] for b in range(nb) ]
    for b in range(nb - 1, 0, -1):
        Ic[mc.parent[b]] = m_add(Ic[mc.parent[b]], Ic[b])
    M = [[0.0] * nv for _ in range(nv)]
    for i in range(6):
        for j in range(6):
            M[i][j] = Ic[0][i][j]
    for j in range(nj):
        b = j + 1
        F = m_vec(Ic[b], S[j])
        M[6 + j][6 + j] = fadd(*[fmul(S[j][r], F[r]) for r in range(6)])
        i = mc.parent[b]
        while i > 0:
            jj = i - 1
            v = fadd(*[fmul(S[jj][r], F[r]) for r in range(6)])
            M[6 + j][6 + jj] = v
            M[6 + jj][6 + j] = v
            i = mc.parent[i]
        for r in range(6):
            M[r][6 + j] = F[r]
            M[6 + j][r] = F[r]

    # ---- RNEA bias forces (udot = 0, gravity pseudo-acceleration)
    a_grav = [0.0, 0.0, 0.0, 0.0, 0.0, float(gravity)]
    accs = [a_grav]
    for b in range(1, nb):
        j = b - 1
        vj = v_scale(qvel[j], S[j])
        accs.append(v_add(accs[mc.parent[b]], motion_cross6(V[b], vj)))
    f_sub = []
    for b in range(nb):
        Iv = m_vec(Isp[b], V[b])
        f_sub.append(v_add(m_vec(Isp[b], accs[b]), force_cross6(V[b], Iv)))
    C = [0.0] * nv
    for b in range(nb - 1, 0, -1):
        j = b - 1
        C[6 + j] = fadd(*[fmul(S[j][r], f_sub[b][r]) for r in range(6)])
        f_sub[mc.parent[b]] = v_add(f_sub[mc.parent[b]], f_sub[b])
    for r in range(6):
        C[r] = f_sub[0][r]

    # ---- applied generalized force (dynamics._applied_generalized_force)
    tau_g = [0.0] * nv
    for r in range(3):
        tau_g[3 + r] = st["ext_force"][r]
    k_lim = 200.0
    for j in range(nj):
        t = st["tau"][j]
        t = fsub(t, fmul(st["joint_friction"][j],
                         jnp.tanh(qvel[j] / 0.05)))
        over = jnp.maximum(st["qpos"][j] - mc.q_upper[j], 0.0)
        under = jnp.maximum(mc.q_lower[j] - st["qpos"][j], 0.0)
        t = fadd(t, fmul(-k_lim, over), fmul(k_lim, under))
        tau_g[6 + j] = t

    # ---- contact terms (contact.contact_terms, unilateral damping cap)
    k_c = st["k_contact"]
    d_c = st["d_contact"]
    cJ = []       # (nc) of (3, nv) sparse lists
    cSpring = []  # (nc) of 3
    cD = []       # (nc) of 3x3
    cN = []
    cActive = []
    for c in range(nc):
        b = mc.collision_body[c]
        p_rel = v_add(pos[b], m_vec(R[b], mc.collision_offset[c]))
        r_c = mc.collision_radius[c]
        if surface is None:
            h = 0.0
            n = [0.0, 0.0, 1.0]
        else:
            h, n = surface[c]
        p_z_world = fadd(st["base_pos"][2], p_rel[2])
        gap = fmul(fsub(fsub(p_z_world, r_c), h), n[2])
        # penetration cap — keep in lockstep with contact.contact_terms
        pen = jnp.minimum(jnp.maximum(-gap, 0.0), 0.2)
        active = pen > 0.0

        J = [[0.0] * nv for _ in range(3)]
        sk = skew3(p_rel)
        for r in range(3):
            for col in range(3):
                J[r][col] = fneg(sk[r][col])
            J[r][3 + r] = 1.0
        for j in mc.ancestors[c]:
            colv = v_add(S[j][3:], cross3(S[j][:3], p_rel))
            for r in range(3):
                J[r][6 + j] = colv[r]

        v_p = v_add(V[b][3:], cross3(V[b][:3], p_rel))
        v_n = dot3(n, v_p)
        v_t = v_sub(v_p, v_scale(v_n, n))
        vt_norm = jnp.sqrt(jnp.maximum(
            fadd(*[fmul(v_t[r], v_t[r]) for r in range(3)]), 1e-12))

        # depenetration-velocity cap (contact.MAX_DEPENETRATION_VEL /
        # contact.PEN_REST — PhysX parity pointfoot_rough_config.py:210):
        # only the spring of penetration in EXCESS of the 0.05 m
        # static-rest band fades as the point exits at >= 1 m/s; the band
        # itself always carries load (stance force is never shed — the
        # round-3 full-spring fade broke walking).  Keep in lockstep with
        # contact.contact_terms
        s_dep = jnp.clip(1.0 - v_n / MAX_DEPENETRATION_VEL, 0.0, 1.0)
        s_band = jnp.clip(1.0 - 2.0 * (v_n / MAX_DEPENETRATION_VEL - 1.0),
                          0.0, 1.0)
        pen_load = jnp.minimum(pen, PEN_REST)
        f_n_spring = fmul(k_c, fadd(fmul(pen_load, s_band),
                                    fmul(fsub(pen, pen_load), s_dep)))
        f_spring = v_scale(jnp.where(active, f_n_spring, 0.0), n)
        d_cap = f_n_spring / jnp.maximum(v_n, 0.05)
        d_n = jnp.where(active, jnp.minimum(d_c, d_cap), 0.0)
        f_n_hat = jnp.maximum(
            fsub(f_n_spring, fmul(d_n, jnp.maximum(v_n, 0.0))), 0.0)
        mu = st["friction"][c]
        c_t = jnp.where(
            active,
            jnp.minimum(fmul(mu, f_n_hat) / jnp.maximum(vt_norm, 1e-3), 2e3),
            0.0)
        D = [[0.0] * 3 for _ in range(3)]
        for r in range(3):
            for s_ in range(3):
                nn = fmul(n[r], n[s_])
                D[r][s_] = fadd(fmul(d_n, nn),
                                fmul(c_t, fsub(1.0 if r == s_ else 0.0, nn)))
        cJ.append(J)
        cSpring.append(f_spring)
        cD.append(D)
        cN.append(n)
        cActive.append(active)

    # ---- assemble A, rhs (dynamics.assemble_velocity_solve)
    A = [row[:] for row in M]
    for c in range(nc):
        # dt * Jᵀ D J with J sparse over columns {0..5} ∪ ancestors
        cols = list(range(6)) + [6 + j for j in mc.ancestors[c]]
        DJ = [[fadd(*[fmul(cD[c][r][s_], cJ[c][s_][col]) for s_ in range(3)])
               for col in cols] for r in range(3)]
        for a_i, col_i in enumerate(cols):
            for a_j, col_j in enumerate(cols):
                if col_j < col_i:
                    continue
                val = fadd(*[fmul(cJ[c][r][col_i], DJ[r][a_j])
                             for r in range(3)])
                if is0(val):
                    continue
                A[col_i][col_j] = fadd(A[col_i][col_j], fmul(dt, val))
                if col_j != col_i:
                    A[col_j][col_i] = A[col_i][col_j]
    for j in range(nj):
        A[6 + j][6 + j] = fadd(A[6 + j][6 + j], dt * mc.joint_damping[j])
    for i in range(nv):
        A[i][i] = fadd(A[i][i], 1e-6)

    u = list(w0) + list(v0) + list(qvel)
    rhs = m_vec(M, u)
    Jt_f0 = [0.0] * nv
    for c in range(nc):
        cols = list(range(6)) + [6 + j for j in mc.ancestors[c]]
        for col in cols:
            Jt_f0[col] = fadd(Jt_f0[col],
                              *[fmul(cJ[c][r][col], cSpring[c][r])
                                for r in range(3)])
    for i in range(nv):
        rhs[i] = fadd(rhs[i], fmul(dt, fadd(tau_g[i], Jt_f0[i],
                                            fneg(C[i]))))
    # ---- velocity solve (joint limits are enforced post-solve by the
    # 1x clamp + qpos clip in the finish section — gen-1/trained-policy
    # parity; see the joint-limit semantics note in dynamics.py)
    u_new = chol_solve_rows(A, rhs)

    # ---- finish (dynamics.finish_step): sensors + integrate
    contact_force = []
    for c in range(nc):
        cols = list(range(6)) + [6 + j for j in mc.ancestors[c]]
        v_p_new = [fadd(*[fmul(cJ[c][r][col], u_new[col]) for col in cols])
                   for r in range(3)]
        f = v_sub(cSpring[c],
                  [fadd(*[fmul(cD[c][r][s_], v_p_new[s_])
                          for s_ in range(3)]) for r in range(3)])
        f_n = dot3(f, cN[c])
        f_t = v_sub(f, v_scale(f_n, cN[c]))
        f_n = jnp.maximum(f_n, 0.0)
        fc = v_add(v_scale(f_n, cN[c]), f_t)
        contact_force.append([jnp.where(cActive[c], fc[r], 0.0)
                              for r in range(3)])

    ang = u_new[:3]
    lin = u_new[3:6]
    ang_m = v_scale(0.5, v_add(w0, ang))
    lin_m = v_scale(0.5, v_add(v0, lin))
    lin = v_add(lin, v_scale(dt, cross3(ang_m, lin_m)))
    # Isaac Gym velocity clamps — keep in lockstep with finish_step
    ang = [jnp.clip(a, -64.0, 64.0) for a in ang]
    lin = [jnp.clip(a, -50.0, 50.0) for a in lin]  # see finish_step
    qvel_new = []
    for j in range(nj):
        # 1x velocity clamp — Isaac + trained-policy parity (see the
        # joint-limit semantics note in dynamics.py)
        vl = mc.velocity_limit[j]
        qvel_new.append(jnp.clip(u_new[6 + j], -vl, vl))
    new_pos = v_add(st["base_pos"], v_scale(dt, lin))
    # quat integrate: q' = normalize(q + dt/2 [w,0] ⊗ q) (ops/quat.integrate)
    dq = quat_mul([ang[0], ang[1], ang[2], 0.0], st["base_quat"])
    q_new = [fadd(st["base_quat"][i], fmul(0.5 * dt, dq[i]))
             for i in range(4)]
    qn = jnp.sqrt(jnp.maximum(
        fadd(*[fmul(q_new[i], q_new[i]) for i in range(4)]), 1e-18))
    q_new = [q / qn for q in q_new]
    qpos_new = []
    for j in range(nj):
        qp = st["qpos"][j] + dt * qvel_new[j]
        # hard position stop at the soft-band edge — keep in lockstep
        # with dynamics.finish_step (gen-1/trained-policy parity)
        qpos_new.append(jnp.clip(qp, mc.q_lower[j] - 0.2,
                                 mc.q_upper[j] + 0.2))

    return {
        "base_pos": new_pos,
        "base_quat": q_new,
        "base_lin_vel": lin,
        "base_ang_vel": ang,
        "qpos": qpos_new,
        "qvel": qvel_new,
        "contact_force": contact_force,
    }


def fk_contact_xy(mc: ModelConsts, st: Dict) -> List:
    """World (x, y) of every collision sphere — positions-only FK.

    The terrain surface gather (TerrainGrid.surface_at) happens OUTSIDE the
    substep kernel; this is the cheap row-form FK that feeds it, replacing
    an XLA mini-FK whose ~30 tiny kernels per substep were launch-bound
    (docs/PROFILE_SUBSTEP.md).  `st` needs base_pos / base_quat / qpos only.
    """
    nb = mc.nb
    R = [quat_to_mat(st["base_quat"])]
    pos = [[0.0, 0.0, 0.0]]
    for b in range(1, nb):
        j = b - 1
        p = mc.parent[b]
        anch = v_add(pos[p], m_vec(R[p], mc.joint_pos[j]))
        frame0 = m_mul(R[p], mc.joint_rot_mat[j])
        R.append(m_mul(frame0, rodrigues_const_axis(mc.joint_axis[j],
                                                    st["qpos"][j])))
        pos.append(anch)
    out = []
    for c in range(mc.nc):
        b = mc.collision_body[c]
        p_rel = v_add(pos[b], m_vec(R[b], mc.collision_offset[c]))
        out.append([fadd(st["base_pos"][0], p_rel[0]),
                    fadd(st["base_pos"][1], p_rel[1])])
    return out


def fk_contact_pos(mc: ModelConsts, st: Dict) -> List:
    """World [x, y, z] of every collision sphere (positions-only FK rows)."""
    nb = mc.nb
    R = [quat_to_mat(st["base_quat"])]
    pos = [[0.0, 0.0, 0.0]]
    for b in range(1, nb):
        j = b - 1
        p = mc.parent[b]
        anch = v_add(pos[p], m_vec(R[p], mc.joint_pos[j]))
        frame0 = m_mul(R[p], mc.joint_rot_mat[j])
        R.append(m_mul(frame0, rodrigues_const_axis(mc.joint_axis[j],
                                                    st["qpos"][j])))
        pos.append(anch)
    out = []
    for c in range(mc.nc):
        b = mc.collision_body[c]
        p_rel = v_add(pos[b], m_vec(R[b], mc.collision_offset[c]))
        out.append([fadd(st["base_pos"][i], p_rel[i]) for i in range(3)])
    return out


def pd_torque_rows(mc: ModelConsts, st: Dict, default_qpos, action_scale,
                   control_type: str, sim_dt: float) -> List:
    """Reference PD law on rows (point_foot.py:523-547; legged_env
    _compute_torques): tau = clip(kp (a·scale + q_def − q) − kd q̇, ±lim)."""
    taus = []
    for j in range(mc.nj):
        scaled = fmul(st["actions"][j], action_scale)
        if control_type == "P":
            err = fadd(scaled, default_qpos[j], fneg(st["qpos"][j]))
            t = fsub(fmul(st["kp"][j], err), fmul(st["kd"][j], st["qvel"][j]))
        elif control_type == "V":
            t = fsub(fmul(st["kp"][j], fsub(scaled, st["qvel"][j])),
                     fmul(st["kd"][j],
                          fsub(st["qvel"][j], st["last_qvel"][j]) / sim_dt))
        elif control_type == "T":
            t = scaled
        else:
            raise NameError(f"Unknown controller type: {control_type}")
        lim = mc_effort_limit(mc)[j]
        taus.append(jnp.clip(t, -lim, lim))
    return taus


def mc_effort_limit(mc: ModelConsts):
    return mc.effort_limit
