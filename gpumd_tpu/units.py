"""Physical constants and unit conversions (GPUMD "natural units").

The unit system matches the reference engine (ref: src/utilities/common.cuh:18-28):
energy in eV, length in Angstrom, mass in amu (Dalton), charge in e.
The derived "natural" time unit is  1 Å·sqrt(amu/eV) = 10.18051 fs,
so user-facing times (fs) are divided by TIME_UNIT_CONVERSION internally.
"""

# Number of chemical elements supported by the potential-file parsers.
NUM_ELEMENTS = 94

# Max path-integral beads (ref: common.cuh:20).
MAX_NUM_BEADS = 128

PI = 3.14159265358979

# hbar in eV * natural-time units (ref: common.cuh:21).
HBAR = 6.465412e-2

# Boltzmann constant in eV/K (ref: common.cuh:22).
K_B = 8.617343e-5

# Coulomb constant 1/(4 pi eps0) in eV*Angstrom/e^2 (ref: common.cuh:23).
K_C = 14.399645

# eV/Angstrom^3 -> GPa (ref: common.cuh:25).
PRESSURE_UNIT_CONVERSION = 1.602177e2

# natural time -> fs (ref: common.cuh:26).
TIME_UNIT_CONVERSION = 1.018051e1

# natural kappa -> W/(m K) (ref: common.cuh:27).
KAPPA_UNIT_CONVERSION = 1.573769e5
