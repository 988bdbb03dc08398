Feature: StringListEdges

  Scenario: substring beyond the end is empty
    Given an empty graph
    When executing query:
      """
      RETURN substring('abc', 5) AS a, substring('abc', 1, 10) AS b
      """
    Then the result should be, in any order:
      | a  | b    |
      | '' | 'bc' |
    And no side effects

  Scenario: replace with empty target and no-op
    Given an empty graph
    When executing query:
      """
      RETURN replace('banana', 'na', '') AS a, replace('abc', 'x', 'y') AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | 'ba' | 'abc' |
    And no side effects

  Scenario: split on a separator not present
    Given an empty graph
    When executing query:
      """
      RETURN split('a,b,c', ';') AS whole, split('a,b,c', ',') AS parts
      """
    Then the result should be, in any order:
      | whole     | parts           |
      | ['a,b,c'] | ['a', 'b', 'c'] |
    And no side effects

  Scenario: left and right clamp to the string length
    Given an empty graph
    When executing query:
      """
      RETURN left('spark', 2) AS l, right('spark', 99) AS r
      """
    Then the result should be, in any order:
      | l    | r       |
      | 'sp' | 'spark' |
    And no side effects

  Scenario: head last and size of lists
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3] AS l
      RETURN head(l) AS h, last(l) AS t, size(l) AS n, head([]) AS eh
      """
    Then the result should be, in any order:
      | h | t | n | eh   |
      | 1 | 3 | 3 | null |
    And no side effects

  Scenario: range with step and descending range
    Given an empty graph
    When executing query:
      """
      RETURN range(0, 10, 5) AS up, range(3, 1, -1) AS down, range(1, 0) AS empty
      """
    Then the result should be, in any order:
      | up         | down      | empty |
      | [0, 5, 10] | [3, 2, 1] | []    |
    And no side effects

  Scenario: negative and out-of-range list indexing
    Given an empty graph
    When executing query:
      """
      WITH ['a', 'b', 'c'] AS l
      RETURN l[0] AS first, l[-1] AS lastv, l[9] AS off
      """
    Then the result should be, in any order:
      | first | lastv | off  |
      | 'a'   | 'c'   | null |
    And no side effects

  Scenario: list slicing
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3, 4, 5] AS l
      RETURN l[1..3] AS mid, l[..2] AS pre, l[3..] AS post
      """
    Then the result should be, in any order:
      | mid    | pre    | post   |
      | [2, 3] | [1, 2] | [4, 5] |
    And no side effects

  Scenario: list concatenation with plus
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] + [3] AS cat, [] + [1] AS fromEmpty
      """
    Then the result should be, in any order:
      | cat       | fromEmpty |
      | [1, 2, 3] | [1]       |
    And no side effects

  Scenario: reduce and list comprehension together
    Given an empty graph
    When executing query:
      """
      WITH [1, 2, 3, 4] AS l
      RETURN reduce(acc = 0, x IN [y IN l WHERE y % 2 = 0] | acc + x) AS evensum
      """
    Then the result should be, in any order:
      | evensum |
      | 6       |
    And no side effects
