"""`python -m yolo_tpu.cli` == `yolo-tpu`."""

from yolo_tpu.cli import main

if __name__ == "__main__":
    main()

