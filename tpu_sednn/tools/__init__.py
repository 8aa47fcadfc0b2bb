from tpu_sednn.tools.netgen import gen_rand_net, extend_net, extend_net_boost
from tpu_sednn.tools.export import wts_to_matlab_dict, save_matlab_weights
