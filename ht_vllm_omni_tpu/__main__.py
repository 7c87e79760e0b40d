from ht_vllm_omni_tpu.entrypoints.cli.main import main

main()
