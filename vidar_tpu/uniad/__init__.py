"""UniAD end-to-end driving stack (capability L9 of SURVEY §2.5).

Components: the track core (fixed-capacity jittable query tracking:
``track.py``), layer-for-layer task heads (``motion_head.py``,
``occ_head.py``, ``panseg_head.py``, ``planning_head.py``), host-side
trajectory smoothing (``motion_optimization.py``), eval metrics
(``metrics.py``), and the ``UniAD`` dispatcher (``uniad.py``) on top of the
shared ViDAR/BEVFormer encoder.
"""

from .track import TrackInstances, RuntimeTracker, QueryInteractionModule
from .heads import (MotionHead, OccHead, PansegformerHead,
                    PlanningHeadSingleMode, PansegHead, PlanningHead)
from .metrics import (IntersectionOverUnion, PanopticMetric, PlanningMetric,
                      MotionMetric)
from .motion_optimization import MotionNonlinearSmoother, nonlinear_smoother
from .uniad import UniADTrack, UniAD
from .loss import UniADTargets, uniad_loss
