"""Command-line entry points mirroring the reference scripts 1:1.

  python -m gnngls_tpu.cli.generate_instances <n_samples> <n_nodes> <dir>
  python -m gnngls_tpu.cli.preprocess_dataset <dir> [--n_train --n_val --n_test]
  python -m gnngls_tpu.cli.train <data_dir> <tb_dir> [hyperparams]
  python -m gnngls_tpu.cli.test <data_path> <model_path> <run_dir> <guides...>
        [--time_limit --perturbation_moves --use_gpu]

Flags match scripts/{generate_instances,preprocess_dataset,train,test}.py
(reference lines cited in each module).  `--use_gpu` is accepted for CLI
compatibility and means "use the accelerator" (TPU here).
"""
