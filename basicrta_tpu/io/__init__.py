"""MD file I/O: topologies, trajectories, and density grids.

No MDAnalysis/gridData dependency: GRO/PDB/PSF/PRMTOP topologies parse in
Python, XTC/TRR/DCD trajectories go through the native C++ library
(native/mdio.cpp), Amber NetCDF/mdcrd trajectories through
scipy/pure-Python readers, and OpenDX densities have a pure-Python writer.
"""

from basicrta_tpu.io.amber import (InpcrdReader, MDCRDReader, NCDFReader,
                                   read_prmtop)
from basicrta_tpu.io.legacy import (load_reference_contacts,
                                    load_reference_gibbs)
from basicrta_tpu.io.native import (XTCReader, XTCWriter, TRRReader,
                                    TRRWriter, DCDReader, DCDWriter,
                                    trajectory_writer)
from basicrta_tpu.io.topology import (PDBModelReader, Topology, read_gro,
                                      read_pdb, read_psf, write_pdb)
from basicrta_tpu.io.universe import Universe

__all__ = [
    "XTCReader", "XTCWriter", "TRRReader", "TRRWriter",
    "DCDReader", "DCDWriter", "trajectory_writer",
    "NCDFReader", "MDCRDReader",
    "PDBModelReader", "InpcrdReader",
    "Topology", "read_gro", "read_pdb", "read_psf", "read_prmtop",
    "write_pdb",
    "Universe", "load_reference_contacts", "load_reference_gibbs",
]
