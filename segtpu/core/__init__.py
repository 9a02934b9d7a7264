from segtpu.core.config import cfg_get, merge_config, set_seed
from segtpu.core.dist import get_device, device_kind
