from .sph import SphForces, evolve_K, sph_forces  # noqa: F401
from .gravity import gravity_allpairs, gravity_sweep  # noqa: F401
from .density import density_at  # noqa: F401
