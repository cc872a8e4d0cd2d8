"""Stepping-controller mechanics tests (EXPERIMENTAL layer).

The gait layer runs and produces an alternating stance schedule and
reachable swing targets; closed-loop biped balance is round-2 tuning work
(see docs/ROUND1_NOTES.md) — these tests pin the mechanics, not balance.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.mpc.gait import GaitConfig, SteppingController, _leg_phase
from pointfoot_tpu.mpc.srb import SRBConfig
from pointfoot_tpu.physics.assets import get_model
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState


def test_gait_clock_alternates():
    g = GaitConfig(period=0.4, duty=0.55)
    offsets = jnp.asarray([0.0, 0.5])
    # over one period the two legs must alternate stance with overlap
    both_stance = single = 0
    for k in range(40):
        phase = k / 40.0
        st = (_leg_phase(phase, offsets) < g.duty)
        if bool(st[0]) and bool(st[1]):
            both_stance += 1
        elif bool(st[0]) != bool(st[1]):
            single += 1
    assert both_stance > 0  # double-support windows exist (duty > 0.5)
    assert single > both_stance  # mostly single support


def test_stepping_controller_runs_and_schedules():
    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    feet = model.collision_indices("foot")
    ctrl = SteppingController(model, params, feet, np.zeros(6),
                              srb_cfg=SRBConfig(height_target=0.6))
    B = 2
    phys = PhysicsState.default(model, np.zeros(6), batch=(B,),
                                base_height=0.62)
    gait = ctrl.init(B, phys)
    cmd = jnp.zeros((B, 3))
    phases = []
    for _ in range(12):
        tau, gait = ctrl.control(phys, cmd, gait)
        phases.append(float(gait.phase[0]))
        assert np.isfinite(np.asarray(tau)).all()
        assert np.abs(np.asarray(tau)).max() <= float(model.effort_limit.max())
    # clock advances by dt/period per tick
    np.testing.assert_allclose(
        np.diff(phases), 0.02 / ctrl.gait.period, atol=1e-5)
    # liftoff/target bookkeeping stays finite and near the robot
    assert np.isfinite(np.asarray(gait.target_pos)).all()
    assert np.abs(np.asarray(gait.target_pos)[..., :2]).max() < 1.0


def test_step_targets_avoid_terrain_edges():
    """Edge-aware placement (round 5): a step target that would land
    within 6 cm of a height discontinuity is shifted onto the side
    matching its own height — a foot on the ledge LIP lands
    half-supported and collapses the stance (measured: ~half of
    phase-decorrelated 5 cm-step approaches fell without this)."""
    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    feet = model.collision_indices("foot")
    hfn = lambda x, y: 0.05 * (jnp.asarray(x, jnp.float32) > 1.0)
    ctrl = SteppingController(model, params, feet, np.zeros(6),
                              height_fn=hfn)
    B = 1
    # place the robot so the Raibert target for a forward walk lands
    # right at the ledge (x = 1.0): walking at 0.4 m/s from x ~ 0.95
    phys = PhysicsState.default(model, np.zeros(6), batch=(B,),
                                base_height=0.62)
    phys = phys.replace(
        base_pos=phys.base_pos.at[:, 0].set(0.97),
        base_lin_vel=phys.base_lin_vel.at[:, 0].set(0.4))
    gait = ctrl.init(B, phys)
    cmd = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.0]), (B, 3))
    for _ in range(30):  # roll through at least one full gait cycle
        tau, gait = ctrl.control(phys, cmd, gait)
        tx = np.asarray(gait.target_pos)[0, :, 0]
        # no target inside the exclusion band around the lip at x=1.0
        # (the probe is +-6 cm; allow a small numerical skin)
        assert not np.any((tx > 1.0 - 0.055) & (tx < 1.0 + 0.055)), tx
        # target z rides the terrain under the (shifted) target xy, modulo
        # the swing profile's small intentional offsets (e.g. the push
        # slightly below the ground line at touchdown)
        tz = np.asarray(gait.target_pos)[0, :, 2]
        for x, z in zip(tx, tz):
            assert abs(z - (0.05 if x > 1.0 else 0.0)) < 0.03, (x, z)


@pytest.mark.slow
def test_biped_walks_closed_loop():
    """The VERDICT round-2 target: pointfoot walks >=5 s under gait-MPC at
    commanded vx with zero falls (50 Hz control / 200 Hz substeps)."""
    from pointfoot_tpu.physics import dynamics

    FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    feet = model.collision_indices("foot")
    ctrl = SteppingController(model, params, feet, np.zeros(6))
    B = 2
    for vx_cmd, vx_tol in ((0.0, 0.12), (0.4, 0.12), (0.8, 0.2)):
        phys = PhysicsState.default(model, np.zeros(6), batch=(B,),
                                    base_height=0.62)
        gait = ctrl.init(B, phys)
        cmd = jnp.broadcast_to(jnp.asarray([vx_cmd, 0.0, 0.0]), (B, 3))

        def tick(carry, _):
            p, g = carry
            tau, g = ctrl.control(p, cmd, g)

            def sub(pp, _):
                return jax.vmap(lambda s, t: dynamics.step(
                    model, params, s, t, FLAT, 0.005))(pp, tau), ()

            p, _ = jax.lax.scan(sub, p, None, length=4)
            return (p, g), (p.base_pos[:, 2], p.base_lin_vel[:, 0])

        (phys, gait), (zs, vxs) = jax.lax.scan(
            tick, (phys, gait), None, length=300)  # 6 s
        zs, vxs = np.asarray(zs), np.asarray(vxs)
        assert zs.min() > 0.40, f"fell at cmd {vx_cmd}: min z {zs.min()}"
        # steady-state tracking over the last 4 s
        vx_ss = vxs[100:].mean()
        assert abs(vx_ss - vx_cmd) < vx_tol, (vx_cmd, vx_ss)


@pytest.mark.slow
def test_biped_reaches_commanded_heading():
    """Heading mode over gait-MPC: with wz = clip(0.5 * wrap(heading - yaw))
    recomputed every tick (reference point_foot.py:487-490), the biped
    reaches a commanded +90 deg heading to within ~6 deg while standing —
    the ~80% force-couple RATE ceiling costs settling time, not endpoint
    accuracy."""
    from pointfoot_tpu.mpc.gait import heading_command
    from pointfoot_tpu.ops import quat as quat_ops
    from pointfoot_tpu.physics import dynamics

    FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    feet = model.collision_indices("foot")
    ctrl = SteppingController(model, params, feet, np.zeros(6))
    B = 2
    phys = PhysicsState.default(model, np.zeros(6), batch=(B,),
                                base_height=0.62)
    gait = ctrl.init(B, phys)
    heading = jnp.full((B,), jnp.pi / 2)
    vxy = jnp.zeros((B, 2))

    def tick(carry, _):
        p, g = carry
        cmd = heading_command(p.base_quat, vxy, heading)
        tau, g = ctrl.control(p, cmd, g)

        def sub(pp, _):
            return jax.vmap(lambda s, t: dynamics.step(
                model, params, s, t, FLAT, 0.005))(pp, tau), ()

        p, _ = jax.lax.scan(sub, p, None, length=4)
        return (p, g), p.base_pos[:, 2]

    (phys, gait), zs = jax.lax.scan(tick, (phys, gait), None, length=350)
    assert np.asarray(zs).min() > 0.40
    final_yaw = np.asarray(jax.vmap(quat_ops.yaw)(phys.base_quat))
    err = np.abs(np.angle(np.exp(1j * (final_yaw - np.pi / 2))))
    assert (err < 0.10).all(), f"heading error {err} rad"


@pytest.mark.slow
def test_biped_walks_on_terrain():
    """Terrain-aware gait-MPC: with a height_fn the stepping controller
    walks continuous uneven ground (ramp, rolling wave) and a 5 cm
    discrete step at vx 0.4 — step-target z, the loaded z-proxy, swing
    clearance (path-max) and the SRB height reference all ride the
    terrain query (validated envelope per scripts/gait_diag.py
    --terrain: slopes <= 0.2, wave/bumps <= 5-6 cm, steps +/-5 cm).

    Round-5 robust-acceptance rewrite (VERDICT r4 item 4): the old B=2
    scenario ran two IDENTICAL envs, so the whole test rode one
    trajectory whose outcome at the 5 cm step edge flips with the gait
    phase it happens to arrive with (bisect showed it red on every
    commit on the r4/r5 hosts while the controller envelope itself was
    healthy).  Now each terrain runs 4 phase-decorrelated starts
    (x0 offsets spanning ~a step length) and accepts on the aggregate:
    >= 3 of 4 starts must cross without falling, per terrain — a
    majority signal over the marginal-stability noise, not a knife-edge
    single threshold."""
    from pointfoot_tpu.physics import dynamics

    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    feet = model.collision_indices("foot")
    terrains = {
        "slope": lambda x, y: 0.15 * jnp.maximum(
            jnp.asarray(x, jnp.float32) - 0.5, 0.0),
        "wave": lambda x, y: 0.04 * jnp.sin(
            2 * jnp.pi * jnp.asarray(x, jnp.float32) / 1.2) * jnp.sin(
            2 * jnp.pi * jnp.asarray(y, jnp.float32) / 1.7),
        "step": lambda x, y: 0.05 * (jnp.asarray(x, jnp.float32) > 1.0),
    }
    B = 4
    x0 = jnp.asarray([0.0, 0.06, 0.12, 0.18])  # ~one step length spread
    for name, hfn in terrains.items():
        ctrl = SteppingController(model, params, feet, np.zeros(6),
                                  height_fn=hfn)
        phys = PhysicsState.default(model, np.zeros(6), batch=(B,),
                                    base_height=0.62)
        phys = phys.replace(base_pos=phys.base_pos.at[:, 0].add(x0))
        gait = ctrl.init(B, phys)
        cmd = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.0]), (B, 3))

        def tick(carry, _):
            p, g = carry
            tau, g = ctrl.control(p, cmd, g)

            def sub(pp, _):
                return jax.vmap(lambda s, t: dynamics.step(
                    model, params, s, t, hfn, 0.005))(pp, tau), ()

            p, _ = jax.lax.scan(sub, p, None, length=4)
            relz = p.base_pos[:, 2] - hfn(p.base_pos[:, 0], p.base_pos[:, 1])
            return (p, g), (relz, p.base_pos[:, 0])

        (phys, gait), (relz, xs) = jax.lax.scan(
            tick, (phys, gait), None, length=300)  # 6 s
        relz, xs = np.asarray(relz), np.asarray(xs)
        # per-env: survived (never below 0.40 rel z) AND made real
        # forward progress (0.4 m/s cmd, slew-limited start).  The upper
        # progress bound rejects envs that got LAUNCHED by a bad contact
        # (observed: a "surviving" env sliding 40-140 m after a fall the
        # rel-z metric missed) — 6 s at cmd 0.4 walks ~2.2-2.4 m.
        prog = xs[-1] - np.asarray(x0)
        ok = (relz.min(axis=0) > 0.40) & (prog > 1.2) & (prog < 3.6)
        assert ok.sum() >= 3, (
            f"{name}: only {ok.sum()}/4 phase-decorrelated starts crossed "
            f"(min relz {relz.min(axis=0)}, progress {xs[-1] - np.asarray(x0)})")


@pytest.mark.slow
def test_biped_survives_perturbed_starts():
    """Perturbed-start robustness (round-3 queue #3): with the latched
    ground estimate (flight recovery) and the commanded-velocity Raibert
    neutral, at most 2 of 32 perturbed starts (2 seeds x 16 envs,
    sigma=0.15 m/s on base lin+ang velocity) fall within 5 s at cmd
    vx=0.4.  The round-1 controller lost ~4/32 (1/8 documented); outcomes
    are marginal-stability sensitive, so the bound is aggregate, not
    per-seed."""
    from pointfoot_tpu.physics import dynamics

    FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    feet = model.collision_indices("foot")
    ctrl = SteppingController(model, params, feet, np.zeros(6))
    B = 16
    falls = 0
    for seed in (2, 7):
        phys = PhysicsState.default(model, np.zeros(6), batch=(B,),
                                    base_height=0.62)
        kv, kw = jax.random.split(jax.random.PRNGKey(seed))
        phys = phys.replace(
            base_lin_vel=phys.base_lin_vel
            + 0.15 * jax.random.normal(kv, phys.base_lin_vel.shape),
            base_ang_vel=phys.base_ang_vel
            + 0.15 * jax.random.normal(kw, phys.base_ang_vel.shape))
        gait = ctrl.init(B, phys)
        cmd = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.0]), (B, 3))

        def tick(carry, _):
            p, g = carry
            tau, g = ctrl.control(p, cmd, g)

            def sub(pp, _):
                return jax.vmap(lambda s, t: dynamics.step(
                    model, params, s, t, FLAT, 0.005))(pp, tau), ()

            p, _ = jax.lax.scan(sub, p, None, length=4)
            return (p, g), p.base_pos[:, 2]

        (phys, gait), zs = jax.lax.scan(tick, (phys, gait), None, length=250)
        falls += int((np.asarray(zs).min(axis=0) < 0.40).sum())
    assert falls <= 2, f"{falls}/32 perturbed starts fell"


@pytest.mark.slow
def test_biped_walks_curriculum_terrain_row0():
    """Gait-MPC on the REAL curriculum TerrainGrid (the terrain the RL
    rough policy trains on), difficulty row 0: smooth-slope, 5 cm-stairs
    (up and down) and discrete-obstacle columns walk at vx 0.4.  The
    rough-slope columns (+/-5 cm noise at 0.2 m wavelength) are the
    documented envelope edge and stairs >= level 2 (9 cm steps) are out
    of envelope — see scripts/gait_diag.py --terrain grid:LEVEL and
    docs/ROUND2_NOTES.md."""
    from pointfoot_tpu.physics import dynamics
    from pointfoot_tpu.terrain.grid import TerrainCfg, build_terrain

    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    feet = model.collision_indices("foot")
    grid = build_terrain(TerrainCfg(), seed=0)
    hfn = grid.height_at
    # one env per walkable terrain family at level 0 (cols: smooth slope
    # x2, stairs up x2, stairs down, discrete obstacles x2)
    cols = np.asarray([0, 1, 4, 8, 12, 16, 18])
    B = len(cols)
    ctrl = SteppingController(model, params, feet, np.zeros(6),
                              height_fn=hfn)
    phys = PhysicsState.default(model, np.zeros(6), batch=(B,),
                                base_height=0.62)
    off = jnp.asarray(np.asarray(grid.env_origins)[0, cols], jnp.float32)
    phys = phys.replace(base_pos=phys.base_pos + off)
    gait = ctrl.init(B, phys)
    cmd = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.0]), (B, 3))

    def tick(carry, _):
        p, g = carry
        tau, g = ctrl.control(p, cmd, g)

        def sub(pp, _):
            return jax.vmap(lambda s, t: dynamics.step(
                model, params, s, t, hfn, 0.005))(pp, tau), ()

        p, _ = jax.lax.scan(sub, p, None, length=4)
        relz = p.base_pos[:, 2] - hfn(p.base_pos[:, 0], p.base_pos[:, 1])
        return (p, g), relz

    (phys, gait), relz = jax.lax.scan(tick, (phys, gait), None, length=220)
    fell = np.asarray(relz).min(axis=0) < 0.40
    # marginal-stability caveat: allow one marginal env, not a pattern
    assert fell.sum() <= 1, f"fell on cols {cols[fell]}"


@pytest.mark.slow
def test_biped_turns_closed_loop():
    """Stepping-based turning (round-3 queue #2): with the turn-adaptive
    double-support window, the biped tracks >=70% of the commanded yaw
    rate at wz +/-0.5 rad/s (vx 0 and 0.4) with zero falls.  A point
    contact transmits no vertical-axis moment, so ~80% rate tracking is
    the measured ceiling of force-couple yaw on this robot; heading-mode
    commands close the remaining gap through the wz = f(heading error)
    outer loop (legged_env heading controller).

    Un-xfail'd in round 5: the failure was diagnosed as stance-leg
    WIND-UP, not host numerics — with no hip-yaw DOF, sustained base yaw
    over planted point feet ratchets abd/hip/knee toward ~1 rad, the
    legs fold, and base z erodes 0.62 -> 0.38 over 5 s.  The posture
    spring (GaitConfig.kp_posture=60 with the startup ramp) bleeds the
    wind-up: min z 0.61 held for the full scenario and yaw tracking
    0.75 -> 0.91 at (vx 0.4, wz 0.5)."""
    from pointfoot_tpu.physics import dynamics

    FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    feet = model.collision_indices("foot")
    ctrl = SteppingController(model, params, feet, np.zeros(6))
    B = 2
    for vx_cmd, wz_cmd in ((0.0, 0.5), (0.4, 0.5), (0.4, -0.5)):
        phys = PhysicsState.default(model, np.zeros(6), batch=(B,),
                                    base_height=0.62)
        gait = ctrl.init(B, phys)
        cmd = jnp.broadcast_to(jnp.asarray([vx_cmd, 0.0, wz_cmd]), (B, 3))

        def tick(carry, _):
            p, g = carry
            tau, g = ctrl.control(p, cmd, g)

            def sub(pp, _):
                return jax.vmap(lambda s, t: dynamics.step(
                    model, params, s, t, FLAT, 0.005))(pp, tau), ()

            p, _ = jax.lax.scan(sub, p, None, length=4)
            from pointfoot_tpu.ops import quat as quat_ops
            yaw = jax.vmap(quat_ops.yaw)(p.base_quat)
            return (p, g), (p.base_pos[:, 2], yaw)

        ticks = 250  # 5 s
        (phys, gait), (zs, yaws) = jax.lax.scan(
            tick, (phys, gait), None, length=ticks)
        zs = np.asarray(zs)
        yaws = np.unwrap(np.asarray(yaws), axis=0)
        assert zs.min() > 0.40, (
            f"fell at vx={vx_cmd} wz={wz_cmd}: min z {zs.min()}")
        progress = (yaws[-1] - yaws[0]).mean() / (wz_cmd * ticks * 0.02)
        assert progress > 0.70, (vx_cmd, wz_cmd, progress)


@pytest.mark.slow
def test_quadruped_trots_closed_loop():
    """A1 quadruped trot under the same stepping stack (hip-anchored
    Raibert placement, diagonal-pair offsets, horizon contact schedule):
    5 s at cmd vx 0.4 with zero falls and small tilt.

    The trot runs control AT the 200 Hz substep rate with stiff attitude
    weights (w_orient 100 / w_omega 5): at the biped's 50 Hz rate the
    swing-leg reaction moment develops a ~0.3 rad pitch offset between
    plan refreshes regardless of the SRB inertia model; at 200 Hz the
    whole-robot inertia walks with max tilt ~0.08 (scripts/gait_diag.py
    --robot a1).  Pins the make_controller("a1") factory entry — the
    config scripts and users actually consume."""
    from pointfoot_tpu.mpc.gait import make_controller
    from pointfoot_tpu.physics import dynamics

    FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
    stack = make_controller("a1")
    ctrl, model, params = stack.ctrl, stack.ctrl.model, stack.ctrl.params
    B = 2
    phys = PhysicsState.default(model, stack.q0, batch=(B,),
                                base_height=stack.z0)
    gait = ctrl.init(B, phys)
    cmd = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.0]), (B, 3))

    def sub(carry, _):
        p, g = carry
        tau, g = ctrl.control(p, cmd, g)
        p = jax.vmap(lambda s, t: dynamics.step(
            model, params, s, t, FLAT, 0.005))(p, tau)
        from pointfoot_tpu.ops import quat as quat_ops
        grav_b = jax.vmap(lambda q: quat_ops.rotate_inverse(
            q, jnp.asarray([0.0, 0.0, -1.0])))(p.base_quat)
        tilt = jnp.arccos(jnp.clip(-grav_b[:, 2], -1, 1))
        return (p, g), (p.base_pos[:, 2], tilt, p.base_lin_vel[:, 0])

    (phys, gait), (zs, tilts, vxs) = jax.lax.scan(
        sub, (phys, gait), None, length=1000)  # 5 s @ 200 Hz
    zs, tilts, vxs = np.asarray(zs), np.asarray(tilts), np.asarray(vxs)
    assert zs.min() > 0.15, f"fell: min z {zs.min()}"
    assert tilts.max() < 0.3, f"tilt blew up: {tilts.max()}"
    # forward progress at a meaningful fraction of the command
    assert vxs[400:].mean() > 0.2, vxs[400:].mean()


@pytest.mark.slow
def test_quadruped_turns_on_terrain():
    """The quad envelope beyond flat-forward: vx 0.4 + wz 0.5 on a 4 cm
    wave field, zero falls and >=60% integrated yaw progress (the slew
    ramp eats ~20%; steady-state rate tracking is ~97% — a quadruped
    keeps 2 feet in contact so the force-couple yaw authority that caps
    the biped at ~85% is not a constraint here).  Terrain plumbing
    (height_fn) is identical to the biped path; also validated via
    scripts/gait_diag.py --robot a1: 15% slopes and +/-5 cm steps at
    vx 0.4 (vx 0.6 on a 15% slope falls ~2.8 s — past the edge)."""
    from pointfoot_tpu.mpc.gait import make_controller
    from pointfoot_tpu.physics import dynamics
    from pointfoot_tpu.terrain.analytic import make_terrain
    from pointfoot_tpu.ops import quat as quat_ops

    hfn = make_terrain("wave:0.04")
    stack = make_controller("a1", height_fn=hfn)
    ctrl, model, params = stack.ctrl, stack.ctrl.model, stack.ctrl.params
    B = 2
    phys = PhysicsState.default(model, stack.q0, batch=(B,),
                                base_height=stack.z0)
    gait = ctrl.init(B, phys)
    cmd = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.5]), (B, 3))

    def sub(carry, _):
        p, g = carry
        tau, g = ctrl.control(p, cmd, g)
        p = jax.vmap(lambda s, t: dynamics.step(
            model, params, s, t, hfn, 0.005))(p, tau)
        relz = p.base_pos[:, 2] - hfn(p.base_pos[:, 0], p.base_pos[:, 1])
        yaw = jax.vmap(quat_ops.yaw)(p.base_quat)
        return (p, g), (relz, yaw)

    (phys, gait), (relzs, yaws) = jax.lax.scan(
        sub, (phys, gait), None, length=1000)  # 5 s @ 200 Hz
    relzs = np.asarray(relzs)
    yaws = np.unwrap(np.asarray(yaws), axis=0)
    assert relzs.min() > 0.15, f"fell: min rel z {relzs.min()}"
    progress = (yaws[-1] - yaws[0]).mean() / (0.5 * 5.0)
    assert progress > 0.60, progress


@pytest.mark.slow
@pytest.mark.parametrize("robot,z_min,vx_min", [
    ("anymal_c", 0.30, 0.30), ("anymal_b", 0.27, 0.30)])
def test_anymal_trots_closed_loop(robot, z_min, vx_min):
    """ANYmal trot via the tuned-stack factory (make_controller): 5 s
    at cmd vx 0.4, zero falls, >=75% steady-state velocity tracking.

    Regression value is double: (1) the trot recipe generalizes to a
    52 kg robot whose legs are ~50% of total mass (slower cadence +
    integral trim + w_vel 50 — see make_controller); (2) it pins the
    URDF joint-limit fix — the anymal_c URDF writes <limit effort
    velocity/> only, and before urdf.py treated the degenerate 0/0
    range as unlimited the baked asset LOCKED every joint at q=0
    (robot forced straight-legged, trot dead on arrival)."""
    from pointfoot_tpu.mpc.gait import make_controller
    from pointfoot_tpu.physics import dynamics

    FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
    stack = make_controller(robot)
    ctrl, model, params = stack.ctrl, stack.ctrl.model, stack.ctrl.params
    B = 2
    phys = PhysicsState.default(model, stack.q0, batch=(B,),
                                base_height=stack.z0)
    gait = ctrl.init(B, phys)
    cmd = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.0]), (B, 3))

    def sub(carry, _):
        p, g = carry
        tau, g = ctrl.control(p, cmd, g)
        p = jax.vmap(lambda s, t: dynamics.step(
            model, params, s, t, FLAT, 0.005))(p, tau)
        return (p, g), (p.base_pos[:, 2], p.base_lin_vel[:, 0])

    (phys, gait), (zs, vxs) = jax.lax.scan(
        sub, (phys, gait), None, length=1000)  # 5 s @ 200 Hz
    zs, vxs = np.asarray(zs), np.asarray(vxs)
    assert zs.min() > z_min, f"fell: min z {zs.min()}"
    vx_ss = vxs[600:].mean()
    assert vx_ss > vx_min, f"undertracks: {vx_ss}"


@pytest.mark.slow
def test_cassie_walks_closed_loop():
    """Cassie (toe-contact biped, six joints per leg, ~10 kg legs) walks
    under the tuned stack at cmd vx 1.2 for 5 s: zero falls and >=95%
    steady-state velocity tracking (the best walker of the family; the
    envelope extends to 2.0 m/s).

    Pins the two cassie-specific mechanisms: 200 Hz control (50 Hz
    crashes within 0.4 s — heavy-leg reaction moments, like the quads)
    and the joint-space posture spring kp_posture=100, without which
    the 3 leg DOF a point toe force cannot control collapse into a
    20 cm crouch (see make_controller)."""
    from pointfoot_tpu.mpc.gait import make_controller
    from pointfoot_tpu.physics import dynamics

    FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
    stack = make_controller("cassie")
    ctrl, model, params = stack.ctrl, stack.ctrl.model, stack.ctrl.params
    B = 2
    phys = PhysicsState.default(model, stack.q0, batch=(B,),
                                base_height=stack.z0)
    gait = ctrl.init(B, phys)
    cmd = jnp.broadcast_to(jnp.asarray([1.2, 0.0, 0.0]), (B, 3))

    def sub(carry, _):
        p, g = carry
        tau, g = ctrl.control(p, cmd, g)
        p = jax.vmap(lambda s, t: dynamics.step(
            model, params, s, t, FLAT, 0.005))(p, tau)
        return (p, g), (p.base_pos[:, 2], p.base_lin_vel[:, 0])

    (phys, gait), (zs, vxs) = jax.lax.scan(
        sub, (phys, gait), None, length=1000)  # 5 s @ 200 Hz
    zs, vxs = np.asarray(zs), np.asarray(vxs)
    assert zs.min() > 0.47, f"fell: min z {zs.min()}"
    vx_ss = vxs[600:].mean()
    assert vx_ss > 1.14, f"undertracks: {vx_ss}"


@pytest.mark.slow
def test_quadruped_walk_gait():
    """The 4-beat lateral-sequence walk (make_controller(..., gait="walk"),
    duty 0.8 — one foot in the air at a time): A1 walks 5 s at cmd 0.4
    with zero falls.  Slower tracking than the trot by design; pace and
    bound are deliberately NOT offered (they fall in ~0.3 s without
    gait-specific momentum control — see the factory docstring)."""
    from pointfoot_tpu.mpc.gait import make_controller
    from pointfoot_tpu.physics import dynamics

    FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
    stack = make_controller("a1", gait="walk")
    ctrl, model, params = stack.ctrl, stack.ctrl.model, stack.ctrl.params
    B = 2
    phys = PhysicsState.default(model, stack.q0, batch=(B,),
                                base_height=stack.z0)
    gait = ctrl.init(B, phys)
    cmd = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.0]), (B, 3))

    def sub(carry, _):
        p, g = carry
        tau, g = ctrl.control(p, cmd, g)
        p = jax.vmap(lambda s, t: dynamics.step(
            model, params, s, t, FLAT, 0.005))(p, tau)
        return (p, g), (p.base_pos[:, 2], p.base_lin_vel[:, 0])

    (phys, gait), (zs, vxs) = jax.lax.scan(
        sub, (phys, gait), None, length=1000)
    zs, vxs = np.asarray(zs), np.asarray(vxs)
    assert zs.min() > 0.15, f"fell: min z {zs.min()}"
    assert vxs[600:].mean() > 0.18, vxs[600:].mean()

    with pytest.raises(ValueError):
        make_controller("pointfoot", gait="walk")
    with pytest.raises(ValueError):
        make_controller("a1", gait="bound")
