"""Menu driver running every example (reference: examples/example.cu:6-116)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import importlib

MODULES = ["1_bfv", "2_bgv", "3_ckks", "4_serialization", "5_kernel_fusing",
           "6_encrypted_matmul", "7_fast_path", "8_poly_eval",
           "9_hiprec_ckks", "10_logistic_inference", "11_mlp_inference"]

if __name__ == "__main__":
    for name in (sys.argv[1:] or MODULES):
        mod = importlib.import_module(name.replace(".py", ""))
        print(f"=== {name} ===")
        for attr in ("bfv_demo", "bgv_demo", "ckks_demo", "demo",
                     "fast_path_demo", "poly_eval_demo", "hiprec_demo",
                     "logistic_demo", "mlp_demo", "bootstrap_demo"):
            if hasattr(mod, attr):
                getattr(mod, attr)(1024)
                break
    print("ALL EXAMPLES PASSED")
