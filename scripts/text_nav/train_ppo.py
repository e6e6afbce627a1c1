"""Train ppo on text_nav — wrapper over the unified CLI."""
import sys

from lmrl_gym_tpu.cli.train import main

if __name__ == "__main__":
    main(["--task", "text_nav", "--algo", "ppo"] + sys.argv[1:])
