import jax.numpy as jnp
import numpy as np

from slam_robot_tpu.models import vehicle


def test_maestro_value_mapping():
    # vehicle.cpp:36: value = target*4*500 + 6000
    assert vehicle.maestro_target_value(0.0) == 6000
    assert vehicle.maestro_target_value(1.0) == 8000
    assert vehicle.maestro_target_value(-1.0) == 4000
    assert vehicle.maestro_target_value(0.75) == 7500


def test_smc_value_mapping():
    # vehicle.cpp:58-67
    assert vehicle.smc_speed_value(0.0) == (0, vehicle.DIRECTION_FORWARD)
    assert vehicle.smc_speed_value(1.0) == (3200, vehicle.DIRECTION_FORWARD)
    assert vehicle.smc_speed_value(-0.18) == (576, vehicle.DIRECTION_REVERSE)


def test_host_vehicle_facade():
    v = vehicle.HostVehicle()
    v.log.clear()  # ignore resume sequence
    v.turn(0.75)
    # servo0 = +d, servo1 = -d (vehicle.cpp:112-115)
    assert v.log[0] == (vehicle.REQUEST_SET_TARGET, 7500, 0)
    assert v.log[1] == (vehicle.REQUEST_SET_TARGET, 4500, 1)
    v.speed(-0.18)
    assert v.log[2] == (vehicle.REQUEST_SET_SPEED, 576, vehicle.DIRECTION_REVERSE)
    v.stop()
    assert (vehicle.REQUEST_SET_USB_KILL, 1, 0) in v.log


def test_emergency_stop():
    log = []
    vehicle.emergency_stop(lambda *a: log.append(a))
    assert (vehicle.REQUEST_SET_USB_KILL, 1, 0) in log
    assert (vehicle.REQUEST_SET_SPEED, 0, vehicle.DIRECTION_FORWARD) in log


def test_dynamics_straight():
    s = vehicle.init_state()
    for _ in range(100):
        s = vehicle.step(s, 0.5, 0.0, dt=0.05)
    # converged to half max speed, straight along +x
    np.testing.assert_allclose(float(s.speed), 1.0, atol=0.05)
    assert float(s.pos[0]) > 3.0
    np.testing.assert_allclose(float(s.pos[1]), 0.0, atol=1e-4)


def test_dynamics_turns():
    s = vehicle.init_state()
    for _ in range(200):
        s = vehicle.step(s, 0.3, 0.5, dt=0.05)
    # turning left: heading increased, curved trajectory
    assert float(s.heading) > 0.5
    assert abs(float(s.pos[1])) > 0.1


def test_dynamics_jit_scan():
    import jax

    def roll(s, _):
        return vehicle.step(s, 0.2, -0.3), None

    s, _ = jax.jit(lambda s: jax.lax.scan(roll, s, None, length=50))(vehicle.init_state())
    assert np.isfinite(float(s.pos[0]))
