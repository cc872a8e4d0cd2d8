"""Contact-model calibration experiments (VERDICT round-1 item 7).

Produces the numbers documented in PARITY.md "Contact calibration":
analytic drop / static-penetration / stick-slip checks of the compliant
sphere-terrain contact against closed-form expectations and the
reference's PhysX-behavioral anchors (1 N contact threshold, 0.62 m
standing height, TGS heavily-damped no-bounce behavior —
point_foot.py:822-868, pointfoot_rough_config.py:202-213).

Usage: python scripts/contact_calibration.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.assets import get_model
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState

FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))


QDEF = np.asarray([-0.1, 0.8, -1.5, 0.1, 0.8, -1.5,
                   -0.1, 1.0, -1.5, 0.1, 1.0, -1.5], np.float32)


def pd_tau(model, p, kp=40.0, kd=1.5):
    """Reference-style stance PD at the default pose so the legs hold while
    the contact itself is measured (a1_config joint defaults)."""
    return jnp.clip(kp * (jnp.asarray(QDEF) - p.qpos) - kd * p.qvel,
                    -model.effort_limit, model.effort_limit)


def run(model, params, phys, steps, dt=0.005, ext=None):
    def body(p, _):
        p = dynamics.step(model, params, p, pd_tau(model, p), FLAT, dt,
                          external_force=ext)
        return p, (p.base_pos, p.base_lin_vel, p.contact_force)

    return jax.lax.scan(body, phys, None, length=steps)


def main():
    # the A1 quadruped: same contact model, but a statically-stable stance
    # (two point feet cannot hold pitch passively, so a biped rig would
    # measure its own toppling, not the contact)
    model = get_model("a1")
    params = PhysicsParams.nominal(model)
    k = float(params.contact_stiffness)
    d = float(params.contact_damping)
    m_tot = float(jnp.sum(model.mass))
    w = m_tot * 9.81
    print(f"model mass {m_tot:.3f} kg (weight {w:.1f} N); "
          f"contact k={k:.3g} N/m, d={d:.3g} N·s/m")

    # 1. static penetration: settle from standing, measure steady pen
    phys = PhysicsState.default(model, QDEF, base_height=0.30)
    phys, (pos, vel, cf) = run(model, params, phys, 400)
    fz = np.asarray(cf[-1][..., 2])
    feet = model.collision_indices("foot")
    fz_feet = fz[list(feet)]
    pen_pred = fz_feet / k
    print(f"1. static: foot normal forces {fz_feet.round(1)} N "
          f"(sum {fz_feet.sum():.1f} vs weight {w:.1f}); "
          f"steady penetration {1e3 * pen_pred.round(5)} mm "
          f"(PhysX TGS anchor: mm-scale)")

    # 2. drop test: foot sphere family — drop robot from +5 cm, measure
    # rebound ratio (TGS anchor: essentially dead impact, no bounce)
    phys = PhysicsState.default(model, QDEF, base_height=0.35)
    phys, (pos, vel, cf) = run(model, params, phys, 400)
    z = np.asarray(pos[:, 2])
    v_imp = np.asarray(vel[:, 2]).min()
    z_min, z_rest = z.min(), z[-1]
    rebound = max(0.0, (z[120:].max() - z_rest))
    print(f"2. drop 5 cm: impact speed {v_imp:.3f} m/s, min z {z_min:.4f}, "
          f"rest z {z_rest:.4f}, residual rebound {1e3 * rebound:.1f} mm "
          f"(restitution ~ {rebound / 0.05:.3f}; PhysX restitution 0)")

    # damping ratio of the normal contact (per foot, effective mass ~ m/2)
    m_eff = m_tot / 2
    zeta = d / (2.0 * np.sqrt(k * m_eff))
    print(f"   normal damping ratio zeta = d/(2 sqrt(k m/2)) = {zeta:.2f} "
          f"(>1: overdamped, matches TGS dead-impact behavior)")

    # 3. stick-slip: push the standing robot laterally with a ramped force;
    # breakaway should occur near mu * weight
    mu = float(np.asarray(params.friction).ravel()[0])
    phys = PhysicsState.default(model, QDEF, base_height=0.30)
    phys, _ = run(model, params, phys, 300)  # settle

    def body(p, f):
        ext = jnp.asarray([f, 0.0, 0.0])
        p = dynamics.step(model, params, p, pd_tau(model, p), FLAT,
                          0.005, external_force=ext)
        return p, (p.base_lin_vel[0], p.base_pos[0])

    forces = jnp.linspace(0.0, 2.0 * mu * w, 800)
    p2, (vx, x) = jax.lax.scan(body, phys, forces)
    vx, x = np.asarray(vx), np.asarray(x)
    # regularized Coulomb: below the cone the contact CREEPS at
    # v = F / (nc * c_t); true breakaway = acceleration past 0.2 m/s
    slid = np.where(vx > 0.2)[0]
    f_break = float(forces[slid[0]]) if len(slid) else float("nan")
    i_half = np.argmin(np.abs(np.asarray(forces) - 0.5 * mu * w))
    print(f"3. stick-slip: mu={mu}, breakaway at {f_break:.1f} N vs "
          f"mu*W = {mu * w:.1f} N (ratio {f_break / (mu * w):.2f}); "
          f"creep speed at 0.5 mu W = {vx[i_half]:.4f} m/s "
          f"(regularized-Coulomb artifact, see PARITY.md)")

    # 4. max stable stiffness probe at the 5 ms substep (implicit solve):
    for k_try in (1.2e4, 3e4, 6e4, 1.2e5):
        p_try = params.replace(
            contact_stiffness=jnp.asarray(k_try),
            contact_damping=jnp.asarray(2.0 * np.sqrt(k_try * m_eff)))
        phys = PhysicsState.default(model, QDEF, base_height=0.33)
        phys, (pos, vel, cf) = run(model, p_try, phys, 400)
        z = np.asarray(pos[:, 2])
        fin = np.isfinite(z).all()
        print(f"4. k={k_try:.3g} (crit-damped): stable={fin}, "
              f"rest z={z[-1]:.4f}, max |vz| after settle "
              f"{np.abs(np.asarray(vel[200:, 2])).max():.4f} m/s, "
              f"static pen {1e3 * w / 2 / k_try:.2f} mm")


if __name__ == "__main__":
    main()
