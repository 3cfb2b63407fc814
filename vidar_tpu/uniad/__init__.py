"""UniAD end-to-end driving stack (capability L9 of SURVEY §2.5).

Round-1 scope: the track core (fixed-capacity jittable query tracking:
``track.py``) and compact functional task heads (``heads.py``) wired into the
``UniAD`` dispatcher (``uniad.py``) on top of the shared ViDAR/BEVFormer
encoder. Fidelity to the reference's full 10k-LoC head zoo (panoptic seg
transformer, motion deformable attention, occupancy flow, collision
optimisation) deepens in subsequent rounds; each module documents its current
parity level.
"""

from .track import TrackInstances, RuntimeTracker, QueryInteractionModule
from .uniad import UniADTrack, UniAD
