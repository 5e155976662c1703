from .convert import torch_state_dict_to_params, params_to_flat_state_dict
from .torch_reader import load_torch_pth
from .torch_writer import save_torch_pth
from .snapshot import load_network_snapshot, tf_params_to_torch_state_dict
