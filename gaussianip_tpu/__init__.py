"""gaussianip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
identity-preserving text+image -> 3D human avatar generation.

Re-implements the capability surface of silence-tang/GaussianIP (see SURVEY.md)
with a TPU-first design: a Pallas tile-binned differentiable Gaussian-splat
rasterizer, functional densify/prune over padded-capacity pytrees, a JAX SMPL-X
layer, and a Flax diffusion guidance stack (SD1.5 UNet + ControlNet +
IP-Adapter-FaceID) driven by AHDS/ANPG score distillation.

Component registry mirrors the reference's name->class map
(reference: threestudio/__init__.py:1-13) so configs stay compatible.
"""

__version__ = "0.1.0"

__modules__ = {}


def register(name):
    """Class decorator: register a component under a config-visible name."""

    def decorator(cls):
        if name in __modules__ and __modules__[name] is not cls:
            raise ValueError(f"component '{name}' already registered")
        __modules__[name] = cls
        return cls

    return decorator


def find(name):
    if name not in __modules__:
        raise KeyError(
            f"component '{name}' not registered; known: {sorted(__modules__)}"
        )
    return __modules__[name]


import logging as _logging

logger = _logging.getLogger("gaussianip_tpu")
if not logger.handlers:
    _h = _logging.StreamHandler()
    _h.setFormatter(_logging.Formatter("[%(levelname)s] %(name)s: %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(_logging.INFO)


def info(msg, *args):
    logger.info(msg, *args)


def warn(msg, *args):
    logger.warning(msg, *args)


def debug(msg, *args):
    logger.debug(msg, *args)
