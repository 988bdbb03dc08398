Feature: ListMapSemantics

  Scenario: List indexing and slicing
    Given an empty graph
    When executing query:
      """
      WITH [10, 20, 30, 40] AS l
      RETURN l[0] AS first, l[-1] AS last, l[1..3] AS mid, l[10] AS oob
      """
    Then the result should be, in any order:
      | first | last | mid      | oob  |
      | 10    | 40   | [20, 30] | null |
    And no side effects

  Scenario: range with and without step
    Given an empty graph
    When executing query:
      """
      RETURN range(1, 4) AS a, range(0, 10, 5) AS b, range(3, 1) AS c
      """
    Then the result should be, in any order:
      | a            | b          | c  |
      | [1, 2, 3, 4] | [0, 5, 10] | [] |
    And no side effects

  Scenario: size of lists and strings
    Given an empty graph
    When executing query:
      """
      RETURN size([1, 2, 3]) AS ls, size('hello') AS ss, size([]) AS es
      """
    Then the result should be, in any order:
      | ls | ss | es |
      | 3  | 5  | 0  |
    And no side effects

  Scenario: Map literals and nested access
    Given an empty graph
    When executing query:
      """
      WITH {name: 'x', inner: {v: 42}} AS m
      RETURN m.name AS name, m.inner.v AS v
      """
    Then the result should be, in any order:
      | name | v  |
      | 'x'  | 42 |
    And no side effects

  Scenario: Returning a whole map value
    Given an empty graph
    When executing query:
      """
      RETURN {a: 1, b: [2, 3]} AS m
      """
    Then the result should be, in any order:
      | m                  |
      | {a: 1, b: [2, 3]} |
    And no side effects

  Scenario: List concatenation and membership
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] + [3] AS cat, 3 IN ([1, 2] + [3]) AS has
      """
    Then the result should be, in any order:
      | cat       | has  |
      | [1, 2, 3] | true |
    And no side effects

  Scenario: UNWIND a literal list preserves order and duplicates
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1, 3] AS x RETURN x
      """
    Then the result should be, in any order:
      | x |
      | 3 |
      | 1 |
      | 3 |
    And no side effects

  Scenario: UNWIND of an empty list produces no rows
    Given an empty graph
    When executing query:
      """
      UNWIND [] AS x RETURN x
      """
    Then the result should be empty
    And no side effects

  Scenario: UNWIND of null produces no rows
    Given an empty graph
    When executing query:
      """
      UNWIND null AS x RETURN x
      """
    Then the result should be empty
    And no side effects
