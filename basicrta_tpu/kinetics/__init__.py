"""Kinetic mapping: component trajectories and weighted densities."""

from basicrta_tpu.kinetics.density import (Density, WDensity,
                                           weighted_histogram_3d)
from basicrta_tpu.kinetics.mapper import MapKinetics

__all__ = ["Density", "WDensity", "weighted_histogram_3d", "MapKinetics"]
