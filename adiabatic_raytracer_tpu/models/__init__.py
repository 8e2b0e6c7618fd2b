from adiabatic_raytracer_tpu.models import metric, magnetosphere  # noqa: F401
