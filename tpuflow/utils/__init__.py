from tpuflow.utils.checkpoint import load_level_checkpoint, save_level_checkpoint
from tpuflow.utils.trace import trace_scope
