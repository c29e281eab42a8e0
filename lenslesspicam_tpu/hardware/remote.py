"""Remote hardware control over SSH (reference: lensless/hardware/utils.py
capture/display, lensless/hardware/slm.py set_programmable_mask).

Host-side only — no TPU involvement.  Gated on paramiko (not installed
in compute-only environments); all functions raise a clear error when
SSH support is unavailable.
"""

from __future__ import annotations

import os
import subprocess
import time


def _require_paramiko():
    try:
        import paramiko  # noqa: F401

        return paramiko
    except ImportError as e:
        raise ImportError(
            "Remote capture/display requires paramiko (SSH); install it on a "
            "host with access to the Raspberry Pi."
        ) from e


def check_username_hostname(rpi_username, rpi_hostname, timeout=10):
    """Verify SSH connectivity (hardware/utils.py:293-309)."""
    paramiko = _require_paramiko()
    client = paramiko.SSHClient()
    client.load_system_host_keys()
    client.set_missing_host_key_policy(paramiko.WarningPolicy())
    client.connect(rpi_hostname, username=rpi_username, timeout=timeout)
    return client


def capture(
    rpi_username,
    rpi_hostname,
    fn="capture",
    exp=0.02,
    iso=100,
    bayer=True,
    nbits_out=12,
    localdir=".",
    remote_script="~/LenslessPiCam/scripts/measure/on_device_capture.py",
    **kwargs,
):
    """Capture on the RPi over SSH and scp the file back
    (hardware/utils.py:23-238)."""
    check_username_hostname(rpi_username, rpi_hostname).close()
    remote_fn = f"{fn}.png" if not bayer else f"{fn}.dng"
    cmd = (
        f"ssh {rpi_username}@{rpi_hostname} "
        f"'python {remote_script} fn={fn} exp={exp} iso={iso} bayer={bayer} "
        f"nbits_out={nbits_out}'"
    )
    subprocess.run(cmd, shell=True, check=True)
    local_path = os.path.join(localdir, remote_fn)
    subprocess.run(
        f"scp {rpi_username}@{rpi_hostname}:~/{remote_fn} {local_path}",
        shell=True, check=True,
    )
    return local_path


def display(
    fp,
    rpi_username,
    rpi_hostname,
    screen_res=(1920, 1080),
    brightness=100,
    rot90=0,
    pad=0,
    vshift=0,
    hshift=0,
    remote_path="~/LenslessPiCam_display/test.png",
    wait=2,
):
    """Push an image to the RPi display (hardware/utils.py:239-292)."""
    check_username_hostname(rpi_username, rpi_hostname).close()
    subprocess.run(
        f"scp {fp} {rpi_username}@{rpi_hostname}:{remote_path}",
        shell=True, check=True,
    )
    time.sleep(wait)


def set_programmable_mask(pattern, device="adafruit", rpi_username=None,
                          rpi_hostname=None):
    """scp a mask pattern and run the slm-controller script on the RPi
    (slm.py:45-123)."""
    import numpy as np

    assert rpi_username and rpi_hostname
    check_username_hostname(rpi_username, rpi_hostname).close()
    local = "/tmp/slm_pattern.npy"
    np.save(local, np.asarray(pattern))
    subprocess.run(
        f"scp {local} {rpi_username}@{rpi_hostname}:~/slm_pattern.npy",
        shell=True, check=True,
    )
    subprocess.run(
        f"ssh {rpi_username}@{rpi_hostname} "
        f"'python ~/slm-controller/examples/set_pattern.py --device {device} "
        f"--pattern ~/slm_pattern.npy'",
        shell=True, check=True,
    )


def set_mask_sensor_distance(distance_mm, rpi_username, rpi_hostname,
                             max_distance_mm=16):
    """Drive the stepper motors to set the mask-sensor distance
    (hardware/utils.py:336+)."""
    assert 0 <= distance_mm <= max_distance_mm
    check_username_hostname(rpi_username, rpi_hostname).close()
    subprocess.run(
        f"ssh {rpi_username}@{rpi_hostname} "
        f"'python ~/StepperDriver/move.py --distance {distance_mm}'",
        shell=True, check=True,
    )
