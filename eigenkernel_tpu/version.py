"""Version string, embedded in log.json (`setting.version`).

Reference parity: global_variables.f90:1-8 keeps `g_version`.
"""

VERSION = "eigenkernel-tpu 0.1.0"
