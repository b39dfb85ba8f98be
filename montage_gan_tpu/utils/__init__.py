from .config import EasyDict, construct_class_by_name
from .calc_res import calc_res, calc_init_res, calc_res_combination, find_min_res_combination
