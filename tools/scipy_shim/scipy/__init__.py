# Minimal scipy shim: just enough surface for marineHeatWaves.detect().
# Only scipy.ndimage.label is exercised on the detect() code path; linalg/stats
# are imported by the module but used only by trend/rank helpers we don't call.
from . import linalg, stats, ndimage  # noqa: F401
