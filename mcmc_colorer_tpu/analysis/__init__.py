from mcmc_colorer_tpu.analysis.log_parser import parse_log_file, parse_results_dir

__all__ = ["parse_log_file", "parse_results_dir"]
