"""Serial MPI shim: exactly the calls reference pymgrit makes at np=1."""

UNDEFINED = -32766


class _Request:
    @staticmethod
    def Waitall(requests):
        requests.clear() if hasattr(requests, "clear") else None
        return True


Request = _Request


class Comm:
    def __init__(self, size=1, rank=0):
        self._size = size
        self._rank = rank

    def Get_rank(self):
        return self._rank

    def Get_size(self):
        return self._size

    def barrier(self):
        pass

    Barrier = barrier

    def gather(self, obj, root=0):
        return [obj]

    def allgather(self, obj):
        return [obj]

    def bcast(self, obj, root=0):
        return obj

    def Split(self, color=0, key=0):
        if color == UNDEFINED:
            return COMM_NULL
        return Comm()

    def isend(self, obj, dest, tag=0):
        raise RuntimeError("serial mpi4py stub: point-to-point send attempted")

    def recv(self, source=0, tag=0):
        raise RuntimeError("serial mpi4py stub: point-to-point recv attempted")


class _NullComm(Comm):
    def __init__(self):
        super().__init__(size=0, rank=-1)


COMM_WORLD = Comm()
COMM_NULL = _NullComm()
COMM_SELF = Comm()
