import Cslib
