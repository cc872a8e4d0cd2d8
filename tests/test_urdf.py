"""URDF compiler golden-value tests against the PF_P441A robot.

Golden numbers cite the reference asset
/root/reference/resources/robots/PF_P441A/urdf/PF_P441A.urdf (see SURVEY.md
§2.3): 6 actuated revolute joints, effort limit 80 N·m, velocity limit
20 rad/s (50 for knee_R), base mass 8.557 kg, foot collision sphere r=0.03 m.
"""

import numpy as np
import pytest

from pointfoot_tpu.physics.assets import get_model


@pytest.fixture(scope="module")
def pf():
    return get_model("pointfoot")


def test_tree_structure(pf):
    assert pf.nb == 7 and pf.nj == 6
    assert pf.parent[0] == -1
    assert pf.body_names[0] == "base_Link"
    # both legs chain base -> abad -> hip -> knee
    i_abad = pf.body_names.index("abad_L_Link")
    i_hip = pf.body_names.index("hip_L_Link")
    i_knee = pf.body_names.index("knee_L_Link")
    assert pf.parent[i_abad] == 0
    assert pf.parent[i_hip] == i_abad
    assert pf.parent[i_knee] == i_hip


def test_joint_limits(pf):
    eff = np.asarray(pf.effort_limit)
    np.testing.assert_allclose(eff, 80.0)
    vel = np.asarray(pf.velocity_limit)
    j = dict(zip(pf.joint_names, vel))
    assert j["knee_R_Joint"] == 50.0
    assert j["knee_L_Joint"] == 20.0


def test_mass_budget(pf):
    # total = base 8.557 + imu 0.01 + 2*(1.614 + 2.435 + 0.573 + 0.157) + tiny probes
    total = float(np.asarray(pf.mass).sum())
    np.testing.assert_allclose(total, 8.557 + 0.01 + 2 * 4.779, atol=1e-3)
    # welded foot (0.157) and imu (0.01) merged into knee / base bodies
    i_knee = pf.body_names.index("knee_L_Link")
    np.testing.assert_allclose(float(pf.mass[i_knee]), 0.573 + 0.157, atol=1e-4)


def test_foot_collision_sites(pf):
    feet = pf.collision_indices("foot")
    assert len(feet) == 2
    for c in feet:
        np.testing.assert_allclose(float(pf.collision_radius[c]), 0.03)
        # foot link origin in knee frame: knee + (0.15, 0, -0.25981)
        off = np.asarray(pf.collision_offset[c])
        np.testing.assert_allclose(off, [0.15, 0.0, -0.25981], atol=1e-5)
    # base + abad spheres exist for termination contact detection
    assert len(pf.collision_indices("base")) == 1
    assert len(pf.collision_indices("abad")) == 2


def test_joint_axes(pf):
    ax = dict(zip(pf.joint_names, np.asarray(pf.joint_axis)))
    np.testing.assert_allclose(ax["abad_L_Joint"], [1, 0, 0])
    np.testing.assert_allclose(ax["hip_L_Joint"], [0, 1, 0])
    np.testing.assert_allclose(ax["knee_L_Joint"], [0, -1, 0])
    np.testing.assert_allclose(ax["hip_R_Joint"], [0, -1, 0])


def test_all_baked_models_load():
    from pointfoot_tpu.physics.assets import available_models
    names = available_models()
    assert {"pointfoot", "a1", "anymal_b", "anymal_c", "cassie"} <= set(names)
    for n in names:
        m = get_model(n)
        assert m.nb >= 7
        assert np.all(np.asarray(m.mass) >= 0)
