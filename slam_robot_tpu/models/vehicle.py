"""Vehicle: pure dynamics for simulation + the host actuator shim.

The reference's L0 layer (vehicle.{h,cpp}, usb.h, maestro/smc protocol
headers) drives a Pololu Maestro servo controller and a Simple Motor
Controller over libusb. Here that splits into:

- protocol encoders (pure, tested): the exact value mappings the reference
  sends — servo target = t*4*500 + 6000 (vehicle.cpp:36), motor speed =
  |s|*3200 with a direction flag (vehicle.cpp:58-67)
- ``step``: a bicycle-model dynamics function standing in for the physical
  car so the whole perceive->plan->act loop is jittable (no reference
  analog — the reference gets physics from reality)
- ``HostVehicle``: the thin host-side shim (outside jit, io_callback-able)
  with the reference's Vehicle facade — Turn(d) sets servo0=+d, servo1=-d
  (vehicle.cpp:112-115), Stop() zeroes everything + USB-kill
  (vehicle.cpp:98-104), destructor auto-stop. The USB transport is
  pluggable; without hardware it logs (the emergency-stop CLI reuses it).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

# ---- protocol encoders (maestro-protocol.h / smc-protocol.h semantics) ----

REQUEST_SET_TARGET = 0x85       # maestro-protocol.h:35-50
REQUEST_SET_SPEED = 0x90        # smc-protocol.h HpmcRequest
REQUEST_EXIT_SAFE_START = 0x91
REQUEST_SET_USB_KILL = 0x92
DIRECTION_FORWARD = 0
DIRECTION_REVERSE = 1


def maestro_target_value(target: float) -> int:
    """Servo PWM value for target in [-1,1]: t*4*500 + 6000
    (vehicle.cpp:36). 6000 = 1.5ms center in quarter-microseconds."""
    return int(round(target * 4 * 500 + 6000))


def smc_speed_value(speed: float) -> tuple[int, int]:
    """(magnitude 0..3200, direction) for speed in [-1,1]
    (vehicle.cpp:58-67)."""
    direction = DIRECTION_FORWARD
    if speed < 0:
        speed = -speed
        direction = DIRECTION_REVERSE
    return int(round(speed * 3200)), direction


# ---- pure dynamics (simulation stand-in) ----

class VehicleParams(NamedTuple):
    wheelbase: float = 0.26       # m (hobby-car scale)
    max_speed: float = 2.0        # m/s at |speed_cmd| = 1
    max_steer: float = 0.45       # rad at |turn_cmd| = 1
    speed_tau: float = 0.3        # s first-order speed lag


class VehicleState(NamedTuple):
    pos: jnp.ndarray      # [2] x, y (m)
    heading: jnp.ndarray  # scalar rad
    speed: jnp.ndarray    # scalar m/s


def init_state(x=0.0, y=0.0, heading=0.0) -> VehicleState:
    return VehicleState(
        pos=jnp.array([x, y], jnp.float32),
        heading=jnp.float32(heading),
        speed=jnp.float32(0.0),
    )


def step(state: VehicleState, speed_cmd, turn_cmd, dt: float = 0.05,
         params: VehicleParams = VehicleParams()) -> VehicleState:
    """Bicycle model: commands in [-1,1] use the same scaling the real
    actuators get (Turn/Speed, vehicle.cpp:107-115)."""
    target_v = jnp.clip(speed_cmd, -1, 1) * params.max_speed
    alpha = jnp.clip(dt / params.speed_tau, 0.0, 1.0)
    v = state.speed + (target_v - state.speed) * alpha
    steer = jnp.clip(turn_cmd, -1, 1) * params.max_steer
    heading = state.heading + v / params.wheelbase * jnp.tan(steer) * dt
    pos = state.pos + v * dt * jnp.stack([jnp.cos(heading), jnp.sin(heading)])
    return VehicleState(pos=pos, heading=heading, speed=v)


# ---- host shim ----

class HostVehicle:
    """The reference Vehicle facade over a pluggable control-transfer
    transport. transport(request, value, index) -> None; default logs."""

    def __init__(self, transport: Callable[[int, int, int], None] | None = None):
        self.log: list[tuple[int, int, int]] = []
        self.transport = transport or (lambda *a: self.log.append(a))
        # exit safe start + clear USB kill (PololuSMC::resume,
        # vehicle.cpp:73-80)
        self.transport(REQUEST_EXIT_SAFE_START, 0, 0)
        self.transport(REQUEST_SET_USB_KILL, 0, 0)

    def turn(self, d: float) -> None:
        """vehicle.cpp:112-115: servo0 = +d, servo1 = -d."""
        self.transport(REQUEST_SET_TARGET, maestro_target_value(d), 0)
        self.transport(REQUEST_SET_TARGET, maestro_target_value(-d), 1)

    def speed(self, s: float) -> None:
        value, direction = smc_speed_value(s)
        self.transport(REQUEST_SET_SPEED, value, direction)

    def stop(self) -> None:
        """vehicle.cpp:98-104 + USB kill."""
        self.turn(0.0)
        self.speed(0.0)
        self.transport(REQUEST_SET_USB_KILL, 1, 0)

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass


def emergency_stop(transport=None) -> None:
    """The ``stop`` binary (stop.cpp:3-6): construct a Vehicle, Stop()."""
    HostVehicle(transport).stop()
