from iinsvae_tpu.data.zenodo import load_pkl_data, ZENODO_ENVS, label_dictionary, label_int2str
from iinsvae_tpu.data.ewine import load_reg_data, load_data_from_file, load_data_from_folder
from iinsvae_tpu.data.splits import err_mitigation_dataset, Standardizer
from iinsvae_tpu.data.synthetic import synthetic_zenodo_frame, synthetic_arrays, ensure_dataset

__all__ = [
    "load_pkl_data",
    "ZENODO_ENVS",
    "label_dictionary",
    "label_int2str",
    "load_reg_data",
    "load_data_from_file",
    "load_data_from_folder",
    "err_mitigation_dataset",
    "Standardizer",
    "synthetic_zenodo_frame",
    "synthetic_arrays",
    "ensure_dataset",
]
