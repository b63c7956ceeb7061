from dinounet_tpu.planning import planner as _planner  # registers ExperimentPlanner
from dinounet_tpu.planning import resenc_planner as _resenc  # registers ResEncUNetPlanner
