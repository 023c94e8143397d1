import FLT
